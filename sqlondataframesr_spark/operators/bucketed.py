"""Bucketed (pre-shuffled) tables — the co-located join strategy.

A join between two tables bucketed by the join key into the same
bucket count reads co-located buckets directly: NO shuffle exchange at
query time. At 100 TB this is the difference between re-shuffling the
fact table on every join and paying that shuffle ONCE at write time —
the standard layout for a fact table joined repeatedly on its key
(Spark's ``bucketBy``; Hive bucketed tables are the ancestor).

The reference (a single-process R notebook) has no table layout
surface at all — in-memory data.tables are "co-located" trivially.
This module is the north-star analogue for an engine whose tables
live on a cluster: layout is a first-class performance decision.

tests/test_plans.py::test_bucketed_join_no_shuffle asserts the plan
property this module exists for: SortMergeJoin with ZERO exchanges.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist ``df`` as a managed parquet table bucketed by ``keys``.

    ``sort_cols`` additionally sorts rows *within* each bucket file, so
    a later merge join needs no sort either (plan shows neither
    Exchange nor Sort above the scans). One shuffle now, zero per
    downstream join.
    """
    writer = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, *keys)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_equi_join(
    spark: SparkSession, left_table: str, right_table: str, on: list
) -> DataFrame:
    """Equi-join two same-bucket-count tables on their bucket keys.

    With matching bucket counts Spark's bucketed scan reports the
    hash-partitioning to the planner and the exchange is elided; with
    MISMATCHED counts set ``spark.sql.bucketing.coalesceBucketsInJoin
    .enabled`` so the finer side coalesces instead of shuffling.
    """
    return spark.table(left_table).join(spark.table(right_table), on)
