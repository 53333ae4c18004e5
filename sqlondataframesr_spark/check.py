"""Differential-testing harness.

The reference's correctness methodology is N-version testing: every
query's sqldf/SQLite result is the oracle and each alternative
implementation is compared with ``dplyr::all_equal(..,
ignore_row_order=TRUE)`` (RDataFramesSQL.Rmd:40-53, 154-169). We keep
the same discipline with two comparators:

- :func:`compare_spark_duckdb` — Spark result vs an ANSI-SQL oracle
  executed by DuckDB on the same parquet files (what the driver's
  correctness gate does).
- :func:`compare_frames` — Spark-vs-Spark (fluent form vs SQL form of
  the same query), recreating the reference's internal N-version
  structure before the external oracle ever sees either.

Comparison is order-insensitive (canonical sort on all columns) unless
the query had an ORDER BY, mirroring the reference's explicit
``ignore_row_order=TRUE`` for its unordered tasks.
"""

from __future__ import annotations

import math
from typing import Any

from pyspark.sql import DataFrame

from .catalog import TABLES


def duckdb_connect(sf_dir: str):
    """A DuckDB connection with the same tables registered as views."""
    import duckdb

    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canonical(rows: list[tuple], float_tol: float) -> list[tuple]:
    def norm(v: Any):
        if v is None:
            return ("\x00null",)
        if isinstance(v, float):
            if math.isnan(v):
                return ("f", "nan")
            # quantize so engine-order float noise below tol compares equal
            return ("f", round(v / float_tol) if float_tol else v)
        if isinstance(v, (list, tuple)):
            return ("l", tuple(norm(x) for x in v))
        return (type(v).__name__, v)

    return sorted((tuple(norm(v) for v in row) for row in rows))


def _spark_rows(df: DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = df.select(cols).collect()
    return cols, [tuple(r[c] for c in cols) for r in rows]


def compare_rows(
    left_cols: list[str],
    left_rows: list[tuple],
    right_cols: list[str],
    right_rows: list[tuple],
    float_tol: float = 1e-6,
) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = equal)."""
    problems: list[str] = []
    if [c.lower() for c in left_cols] != [c.lower() for c in right_cols]:
        problems.append(f"column mismatch: {left_cols} vs {right_cols}")
        return problems
    if len(left_rows) != len(right_rows):
        problems.append(f"row count: {len(left_rows)} vs {len(right_rows)}")
    lc = _canonical(left_rows, float_tol)
    rc = _canonical(right_rows, float_tol)
    if lc != rc:
        diff_l = [r for r in lc if r not in rc][:3]
        diff_r = [r for r in rc if r not in lc][:3]
        problems.append(f"value mismatch; only-left={diff_l} only-right={diff_r}")
    return problems


def compare_spark_duckdb(
    df: DataFrame, oracle_sql: str, sf_dir: str, float_tol: float = 1e-6
) -> list[str]:
    con = duckdb_connect(sf_dir)
    try:
        cur = con.execute(oracle_sql)
        right_cols = [d[0] for d in cur.description]
        right_rows = [tuple(r) for r in cur.fetchall()]
    finally:
        con.close()
    order = sorted(range(len(right_cols)), key=lambda i: right_cols[i])
    right_cols = [right_cols[i] for i in order]
    right_rows = [tuple(r[i] for i in order) for r in right_rows]
    left_cols, left_rows = _spark_rows(df)
    return compare_rows(left_cols, left_rows, right_cols, right_rows, float_tol)


def compare_frames(a: DataFrame, b: DataFrame, float_tol: float = 1e-6) -> list[str]:
    la, ra = _spark_rows(a)
    lb, rb = _spark_rows(b)
    return compare_rows(la, ra, lb, rb, float_tol)


#: DuckDB output types whose driver-side hash is known to agree with
#: the Spark value at equal magnitudes. Notably ABSENT: HUGEINT (what a
#: bare ``SUM(INTEGER)``/``count_if`` returns in DuckDB) and DECIMAL —
#: both hash differently from Spark's BIGINT/DOUBLE even when the
#: numbers are equal, which burned se_task2/se_task5/q45 in round 4.
ORACLE_TYPE_WHITELIST = frozenset({
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT", "UBIGINT", "UINTEGER",
    "DOUBLE", "FLOAT", "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP",
    "TIMESTAMP_NS", "TIMESTAMP WITH TIME ZONE",
})


def oracle_type_violations(con, oracle_sql: str) -> list[tuple[str, str]]:
    """(column, duckdb_type) pairs whose declared output type falls
    outside :data:`ORACLE_TYPE_WHITELIST`.

    Run at registration time on every ``oracle_sql()`` entry: DuckDB
    plans the query without executing it, so this catches a bare
    ``SUM()`` (HUGEINT) or an unpinned DECIMAL before the driver's
    value hash ever sees it.
    """
    rel = con.sql(oracle_sql)
    return [
        (c, str(t)) for c, t in zip(rel.columns, rel.types)
        if str(t).split("(")[0] not in ORACLE_TYPE_WHITELIST
    ]
