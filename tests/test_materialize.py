"""Materialization choke-point contract (sqlondataframesr_spark.materialize)."""

from __future__ import annotations

from pyspark import StorageLevel

from sqlondataframesr_spark.materialize import _PINNED, materialize, release_all


def test_materialize_pins_and_release_unpersists(spark):
    df = spark.range(100).selectExpr("id", "id * 2 as v")
    pinned = df.transform(materialize)
    assert pinned in _PINNED
    assert pinned.storageLevel == StorageLevel.MEMORY_AND_DISK_DESER
    pinned.count()  # materialize the cache
    release_all()
    assert not _PINNED
    assert pinned.storageLevel == StorageLevel.NONE


def test_release_all_is_idempotent_and_safe(spark):
    release_all()  # empty: no-op
    df = spark.range(10).transform(materialize)
    release_all()
    release_all()
    # plan still computable after unpersist (lineage preserved)
    assert df.count() == 10
