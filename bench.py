"""Benchmark harness — the analogue of the reference's
``microbenchmark(times=5)`` tables (RDataFramesSQL.Rmd:139-152 and
siblings; numbers in BASELINE.md).

Per query: 1 warm-up run + timed runs (plan build → action → full
materialization), report the median, excluding SparkSession startup —
matching the protocol in BASELINE.md §"How we benchmark". The headline
``value`` sums the medians of the SIX transposed reference queries
(q1..q6) — the like-for-like comparison against BASELINE.md's six
sqldf medians; extension operators (dedup/ANN/windows/multimodal) are
timed too and reported under "queries" with the grand total in
"total_all_queries". Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec",
     "queries": {"q1...": sec, ...}, "sf": 0.1, ...}

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

#: reference protocol is microbenchmark(times=5); extensions get 3 to
#: keep the whole bench inside the driver's per-round budget
REF_RUNS = 5
EXT_RUNS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark(app_name="bench")

    # like-for-like vs BASELINE.md = the SIX transposed reference tasks
    ref_names = {
        "q1_yearly_top_order",
        "q2_top_customers_by_spend",
        "q3_top_orders_by_big_items",
        "q4_price_spread",
        "q5_user_event_totals",
        "q6_distinct_suppliers_of_qualifying_brands",
    }
    is_ref = ref_names.__contains__

    # Time the six baseline-comparable queries FIRST, in a fresh JVM,
    # so heap/GC state left by the (heavier) extension operators can't
    # leak into the headline medians; extensions follow alphabetically.
    queries = sorted(
        registry.queries().items(), key=lambda kv: (not is_ref(kv[0]), kv[0])
    )

    # Global JVM warm-up: a fresh JVM spends the first few actions
    # JIT-compiling Spark's codegen/shuffle machinery, which would land
    # entirely on whichever queries run first. Run the headline six
    # once untimed (plus their per-query warm-up below) so every timed
    # run executes against a hot JVM — the BASELINE.md protocol times
    # warm engines too (microbenchmark reuses loaded R sessions).
    for name, fn in queries:
        if is_ref(name):
            fn(spark, sf_dir).toPandas()

    timings: dict[str, float] = {}
    for name, fn in queries:
        # Per-query warm-up: JIT, parquet footer cache, AQE stats.
        # Materialization is Arrow-batched toPandas — columnar
        # transfer, the engine's real full-result path (per-Row
        # collect() would time Python object construction, not the
        # engine).
        fn(spark, sf_dir).toPandas()
        samples = []
        for _ in range(REF_RUNS if is_ref(name) else EXT_RUNS):
            t0 = time.perf_counter()
            fn(spark, sf_dir).toPandas()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 4)

    ref_total = sum(v for k, v in timings.items() if is_ref(k))
    print(
        json.dumps(
            {
                "metric": "sum_of_reference_query_medians",
                "value": round(ref_total, 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "total_all_queries": round(sum(timings.values()), 4),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
