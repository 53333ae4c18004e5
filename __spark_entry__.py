"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``sqlondataframesr_spark`` package; this
module just adapts it to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sqlondataframesr_spark import (  # noqa: E402
    materialize as _materialize,
    registry,
    session as _session,
)

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (task-3 shape: filter → agg → join → top-k) on sf0.001."""
    _session.configure(spark)
    return registry.queries()["q3_top_orders_by_big_items"](spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs = registry.queries()

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _session.configure(spark)  # driver session may lack our confs
            # drop the previous query's pinned branches (per-query
            # cache scope — see sqlondataframesr_spark.materialize)
            _materialize.release_all()
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in qs.items()}


def oracle_sql() -> dict[str, str]:
    return registry.oracles()
