"""Differential tests for the six transposed reference queries.

Mirrors the reference's own methodology (RDataFramesSQL.Rmd:40-53):
each query is checked (a) fluent vs Spark-SQL form (internal N-version)
and (b) against the DuckDB oracle (external ground truth) at sf0.001.
"""

from __future__ import annotations

import pytest

from sqlondataframesr_spark import registry
from sqlondataframesr_spark.catalog import register_views
from sqlondataframesr_spark.check import compare_frames, compare_spark_duckdb

NAMES = sorted(registry.queries())


@pytest.mark.parametrize("name", NAMES)
def test_vs_duckdb_oracle(spark, sf_dir, name):
    df = registry.queries()[name](spark, sf_dir)
    oracle = registry.oracles().get(name)
    if oracle is None:
        assert df.count() >= 0
        return
    problems = compare_spark_duckdb(df, oracle, sf_dir)
    assert not problems, f"{name}: {problems}"


@pytest.mark.parametrize("name", sorted(registry.spark_sql()))
def test_fluent_vs_spark_sql(spark, sf_dir, name):
    register_views(spark, sf_dir)
    # fixture-building hook BEFORE the SQL text runs — the dual must
    # work standalone, not rely on fluent-first ordering (ADVICE r6)
    registry.sql_prereqs().get(name, lambda: None)()
    fluent = registry.queries()[name](spark, sf_dir)
    via_sql = spark.sql(registry.spark_sql()[name])
    problems = compare_frames(fluent, via_sql)
    assert not problems, f"{name}: {problems}"


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
