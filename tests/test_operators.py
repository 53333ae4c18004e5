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
