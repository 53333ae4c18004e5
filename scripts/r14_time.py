"""Quick per-query timing probe for the r14 optimization round: N-run
medians (default 5) under the bench's conf policy (default confs for
extension operators), full Arrow toPandas materialization, release_all
between runs — the bench protocol minus the battery.

Usage: python scripts/r14_time.py [-n 7] query [query ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from sqlondataframesr_spark import registry  # noqa: E402
from sqlondataframesr_spark.materialize import release_all  # noqa: E402
from sqlondataframesr_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    n = 5
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    spark = get_spark(app_name="r14-time")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    for name in args:
        fn = qs[name]
        fn(spark, SF_DIR).toPandas()  # warm-up
        release_all()
        samples = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).toPandas()
            samples.append(time.perf_counter() - t0)
            release_all()
        print(
            f"{name}: median={statistics.median(samples):.3f}s"
            f" min={min(samples):.3f} max={max(samples):.3f} n={n}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
