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
