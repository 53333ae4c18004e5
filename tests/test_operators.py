"""Unit tests for reusable operators on tiny literal DataFrames —
the fast inner loop the reference lacks (SURVEY.md §5)."""

from __future__ import annotations

from sqlondataframesr_spark.operators.argmax import argmax_maxby, argmax_window


def test_argmax_strategies_agree(spark):
    df = spark.createDataFrame(
        [
            # (grp, key, measure) with a tie in grp=1 at measure=5
            (1, 10, 5),
            (1, 7, 5),
            (1, 99, 1),
            (2, 3, 9),
            (2, 4, 9),  # tie -> key 3 wins
            (3, 42, 0),
        ],
        ["grp", "key", "measure"],
    )
    via_window = {
        (r["grp"], r["key"], r["measure"])
        for r in argmax_window(df, ["grp"], "measure", ["key"]).collect()
    }
    via_maxby = {
        (r["grp"], r["key"], r["measure"])
        for r in argmax_maxby(
            df, ["grp"], "measure", payload=["key"], tiebreak="key"
        ).collect()
    }
    assert via_window == via_maxby == {(1, 7, 5), (2, 3, 9), (3, 42, 0)}


def test_salted_join_equals_plain_join(spark, sf_dir):
    """Salting must be a pure physical rewrite: row-for-row identical
    output to the unsalted join, hot keys spread over n buckets."""
    from pyspark.sql import functions as F

    from sqlondataframesr_spark.catalog import load_table
    from sqlondataframesr_spark.check import compare_frames
    from sqlondataframesr_spark.operators.salt import salted_join

    events = load_table(spark, sf_dir, "events")
    # tiny dim: one row per event_type
    dim = (
        events.select("event_type").distinct()
        .withColumn("type_code", F.crc32("event_type") % 1000)
    )
    plain = events.join(dim, ["event_type"]).select("event_id", "type_code")
    salted = salted_join(events, dim, keys=["event_type"], n_salts=8).select(
        "event_id", "type_code"
    )
    assert not compare_frames(salted, plain)


def test_asof_join_semantics(spark):
    """Inclusive (>=) match, latest-preceding wins, NULLs when nothing
    precedes, left rows always survive."""
    import pytest
    from sqlondataframesr_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            (1, 5, "a"),   # matches right t=5 (equal ts is inclusive)
            (1, 9, "b"),   # matches right t=7 (latest preceding)
            (1, 2, "c"),   # nothing precedes -> NULL
            (2, 4, "d"),   # key with no right rows at all -> NULL
        ],
        "k int, t int, tag string",
    )
    right = spark.createDataFrame(
        [(1, 5, 50), (1, 7, 70), (1, 11, 110)], "k int, t int, val int"
    )
    got = {
        (r["k"], r["t"]): r["val"]
        for r in asof_join(left, right, ["k"], "t", "t").collect()
    }
    assert got == {(1, 5): 50, (1, 9): 70, (1, 2): None, (2, 4): None}

    with pytest.raises(ValueError, match="rename"):
        asof_join(left, right.withColumnRenamed("val", "tag"), ["k"], "t", "t")
