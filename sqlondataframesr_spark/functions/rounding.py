"""Engine-portable 6-dp rounding (r11, skew-exposed).

``round(x, 6)`` is NOT portable across Spark and DuckDB at decimal
ties: Spark rounds the double's exact decimal representation
(BigDecimal HALF_UP) while DuckDB scales in float, and integer-ratio
inputs (mean = Σmicros / n, TTR = distinct/total, jaccard = a/b) land
on exact .5-micro boundaries for ordinary denominators (n=2 with an
odd numerator already ties). The r11 skew tree caught two live
divergences of this class (58 cosines split in the 6th decimal, one
centroid micro off by one); this module is the repo-wide fix for the
rest of the sites, applied BEFORE they fire.

The portable spelling is ``floor(x * 1e6 + 0.5) / 1e6``: IEEE-754
multiply/add/floor/divide are each correctly rounded, so both engines
compute bit-identical doubles for every input (ties round toward +inf
on BOTH engines — direction is irrelevant, agreement is the contract).
SQL literals are CAST(... AS DOUBLE) because Spark parses a bare
``1000000.0`` as DECIMAL and silently retypes the expression.

See also: ``llm/similarity._mean_us`` (the all-integer sibling for
means of integer sums) and ``functions/vector.cosine`` (the first
consumer of this spelling).

Directional caveat (ADVICE r11): the two repo "half-up" idioms are
NOT interchangeable on signed data. This module's floor spelling
rounds .5-micro ties toward **+inf** (−1.5 µ → −1 µ), while
``_mean_us``'s integer spelling rounds ties **away from zero**
(−1.5 µ → −2 µ). Each is bit-identical across Spark and DuckDB — the
cross-engine contract holds either way — but swapping one for the
other under a column that can go negative changes results at ties.
Keep whichever spelling a site already uses; when adding a new signed
site, pick one and mirror it EXACTLY in the oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, functions as F

#: the double-typed scale literal, portable across both SQL dialects
_SCALE_SQL = "CAST(1000000.0 AS DOUBLE)"
_HALF_SQL = "CAST(0.5 AS DOUBLE)"


def r6(c: Column | str) -> Column:
    """6-dp round of a double Column, engine-portable spelling.
    Accepts a column NAME too (the F.round calling convention this
    replaced) — a bare string would otherwise become a string
    LITERAL in the arithmetic."""
    if isinstance(c, str):
        c = F.col(c)
    return F.floor(c * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)


def r6_sql(expr: str) -> str:
    """6-dp round as SQL text — valid and bit-identical in Spark SQL
    and DuckDB."""
    return f"(floor(({expr}) * {_SCALE_SQL} + {_HALF_SQL}) / {_SCALE_SQL})"


def r6_py(x: float) -> float:
    """The Python twin (for locally-computed expected tables, e.g.
    multimodal/expected.py): python's builtin round() is HALF-EVEN,
    which disagrees with the engines' floor spelling at ties."""
    return math.floor(x * 1000000.0 + 0.5) / 1000000.0
