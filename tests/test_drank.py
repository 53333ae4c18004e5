"""Unit tests for operators/drank.py — the distributed exact global
rank/prefix-sum that replaced the unpartitioned windows (VERDICT r9
item 1). The contract is bit-for-bit equality with the single-sort
``row_number()`` / running ``sum()`` / ``NTILE`` it replaces, plus the
no-single-task-sort plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from sqlondataframesr_spark.operators.drank import ntile_expr, with_global_rank
from sqlondataframesr_spark.plans.audit import audit


def _data(spark, n, seed_mod=7):
    # deterministic values with heavy ties (v = id % seed_mod) so the
    # tie-break column genuinely decides the order
    return spark.range(n).select(
        F.col("id").cast("long").alias("id"),
        (F.col("id") % seed_mod).cast("long").alias("v"),
    )


@pytest.mark.parametrize("n", [0, 1, 3, 5, 31, 100])
@pytest.mark.parametrize("npart", [1, 4, 32])
def test_rank_and_cum_match_global_window(spark, n, npart):
    """For sizes below/at/above the partition count (incl. empty), the
    distributed rank equals row_number() over the global order and the
    distributed prefix sum equals the global running sum."""
    df = _data(spark, n)
    got = (
        with_global_rank(
            df,
            [("v", "desc"), ("id", "asc")],
            value_col="v",
            num_partitions=npart,
        )
        .select("id", "g_rank", "g_cum", "g_n", "g_vtotal")
        .collect()
    )
    w = Window.orderBy(F.col("v").desc(), F.col("id").asc())
    exp = (
        df.select(
            "id",
            F.row_number().over(w).cast("long").alias("g_rank"),
            F.sum("v")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long")
            .alias("g_cum"),
        ).collect()
    )
    got_m = {r.id: (r.g_rank, r.g_cum) for r in got}
    exp_m = {r.id: (r.g_rank, r.g_cum) for r in exp}
    assert got_m == exp_m
    total_v = sum(i % 7 for i in range(n))
    assert all((r.g_n, r.g_vtotal) == (n, total_v) for r in got)


@pytest.mark.parametrize("n", [1, 2, 4, 5, 9, 10, 11, 37, 100])
@pytest.mark.parametrize("k", [3, 5, 10])
def test_ntile_expr_matches_spark_ntile(spark, n, k):
    """The closed-form bucket equals Spark's NTILE for every (n, k)
    shape: n < k (all singleton buckets), n % k == 0 (even), and the
    first-r-buckets-get-one-extra remainder case."""
    df = _data(spark, n)
    ranked = with_global_rank(df, [("v", "desc"), ("id", "asc")])
    got = {
        r.id: r.b
        for r in ranked.select(
            "id", ntile_expr("g_rank", "g_n", k).alias("b")
        ).collect()
    }
    w = Window.orderBy(F.col("v").desc(), F.col("id").asc())
    exp = {
        r.id: r.b
        for r in df.select(
            "id", F.ntile(k).over(w).cast("long").alias("b")
        ).collect()
    }
    assert got == exp


def test_drank_plan_has_no_single_task_sort(spark):
    """The helper's own plan: rangepartitioning present, every sort
    partition-local — the property the consumers pin query-by-query in
    test_plans.py."""
    df = _data(spark, 1000)
    out = with_global_rank(df, [("v", "asc"), ("id", "asc")], value_col="v")
    a = audit(out)
    assert "rangepartitioning" in a.text
    assert not a.has_single_task_sort
    assert not a.has_cartesian


def test_drank_rejects_bad_direction(spark):
    df = _data(spark, 5)
    with pytest.raises(ValueError):
        with_global_rank(df, [("v", "ascending")])
