"""The engine-portable 6-dp rounding contract (r11, skew-exposed):
``floor(x*1e6+0.5)/1e6`` must agree bit-for-bit between Spark, DuckDB,
and the Python twin ON EXACT DECIMAL TIES — the inputs where plain
``round(x, 6)`` diverged in production (0.995578 vs 0.995577 on the
skew tree's dense cluster)."""

from __future__ import annotations

import duckdb
import pytest

from sqlondataframesr_spark.functions.rounding import r6, r6_py, r6_sql

#: integer-ratio inputs that land exactly on .5-micro boundaries
#: (the class the skew tree exposed), plus negatives and non-ties
TIE_CASES = [
    1.0 / 128,        # 0.0078125 — exact tie at 6 dp
    3.0 / 128,
    -1.0 / 128,       # negative tie
    -65393.5 / 1e6,   # the centroid case's magnitude
    0.9955775,        # dense-cluster cosine neighborhood
    1.0 / 3,          # non-tie transcendental-ish
    0.0,
    -2.5e-6,
]


def test_r6_spark_duckdb_python_agree_on_ties(spark):
    sdf = spark.createDataFrame([(x,) for x in TIE_CASES], "x double")
    got_spark = [
        r["y"] for r in sdf.select(r6("x").alias("y")).orderBy("x").collect()
    ]
    got_spark_sql = [
        r["y"]
        for r in sdf.selectExpr(f"{r6_sql('x')} as y", "x")
        .orderBy("x")
        .collect()
    ]
    con = duckdb.connect()
    got_duck = [
        r[0]
        for r in con.execute(
            "SELECT " + r6_sql("x") + " FROM (SELECT unnest(?) AS x) ORDER BY x",
            [sorted(TIE_CASES)],
        ).fetchall()
    ]
    got_py = [r6_py(x) for x in sorted(TIE_CASES)]
    assert got_spark == got_spark_sql == got_duck == got_py


def test_r6_differs_from_naive_round_exactly_at_ties():
    """Documents WHY the spelling exists: python round() is HALF_EVEN
    and disagrees with the floor form at odd ties — if this ever
    starts passing with round(), the helper has been regressed."""
    tie = 1.0 / 128  # 0.0078125
    assert r6_py(tie) == 0.007813
    assert round(tie, 6) == 0.007812  # HALF_EVEN rounds to even


def test_r6_accepts_column_names(spark):
    sdf = spark.createDataFrame([(0.25,)], "v double")
    assert sdf.select(r6("v").alias("y")).collect()[0]["y"] == 0.25
