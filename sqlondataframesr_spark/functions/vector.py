"""Vector math over ``array<float|double>`` columns — pure Spark SQL
expressions (codegen'd JVM-side, no UDF in the hot path).

Shared by the similarity-search and embedding-dedup operators; kept as
SQL-text builders (not Column objects) so they compose into both
`F.expr` call sites and generated SQL strings.
"""

from __future__ import annotations


def to_double(col: str = "embedding") -> str:
    """Cast array<float> → array<double> once, before any arithmetic."""
    return f"transform({col}, x -> cast(x as double))"


def dot(a: str, b: str) -> str:
    """Dot product via zip_with + fold (stays in whole-stage codegen)."""
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (a, x) -> a + x)"


def l2_norm(v: str) -> str:
    return f"sqrt(aggregate({v}, 0D, (a, x) -> a + x * x))"


def cosine(a: str, b: str, na: str, nb: str, decimals: int = 6) -> str:
    """Cosine from precomputed norms, rounded for cross-engine
    comparability (see llm/similarity.py determinism notes).

    The norm product is NULLIF-guarded: a zero-norm vector (possible
    for sliced prefixes, e.g. the Matryoshka 16-dim head) must yield
    NULL on EVERY engine. Spark's non-ANSI x/0 is already NULL, but
    DuckDB's default ieee_floating_point_ops yields inf/nan — which
    sorts FIRST under DESC NULLS LAST and silently diverges the
    shortlist. nullif pins both engines to NULL (r8 ADVICE item)."""
    return f"round({dot(a, b)} / nullif({na} * {nb}, 0), {decimals})"
