"""Capped-vs-uncapped timings on a skew tree (VERDICT r11 item 7).

The cap guards exist so planted hot keys cannot go quadratic; this
script produces the number that shows them paying for themselves: the
median wall time of each capped operator next to its exact/uncapped
sibling ON THE SKEW TREE, where the caps BIND (the sf0.01 skew gate
proves binding + oracle-EXACTness; this measures the cost difference
at whatever scale the tree was generated — run it on the sf0.1 twin
for the bench-scale numbers, SCALE.md records them).

Usage:
    python scripts/bench_skew_caps.py [skew_sf_dir]
    # default: /tmp/sqlondataframesr_testdata_skew_sf01/sf0.1

Prints one JSON line: {pair_name: {"capped": s, "uncapped": s}, ...}.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sqlondataframesr_spark import registry  # noqa: E402
from sqlondataframesr_spark.materialize import release_all  # noqa: E402
from sqlondataframesr_spark.session import get_spark  # noqa: E402

#: (label, capped query, uncapped/exact sibling) — each sibling pair
#: is oracle-gated individually; the skew tree makes the caps bind
PAIRS = [
    ("ngram_jaccard", "dedup_ngram_jaccard_capped", "dedup_ngram_jaccard"),
    ("substring_13gram", "dedup_substring_13gram_capped",
     "dedup_substring_13gram"),
    ("sessionize_profile", "evt_sessionize_profile_capped",
     "evt_sessionize_profile"),
    ("basket_pairs", "basket_top_pairs_capped", "basket_top_pairs"),
]

RUNS = 5


def _median(fn, spark, d) -> float:
    fn(spark, d).toPandas()
    release_all()
    ss = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        fn(spark, d).toPandas()
        ss.append(time.perf_counter() - t0)
        release_all()
    return round(statistics.median(ss), 3)


def main() -> None:
    d = (sys.argv[1] if len(sys.argv) > 1
         else "/tmp/sqlondataframesr_testdata_skew_sf01/sf0.1")
    spark = get_spark(app_name="bench-skew-caps")
    qs = registry.queries()
    out = {}
    for label, capped, uncapped in PAIRS:
        print(f"[skew-caps] {label}", file=sys.stderr, flush=True)
        out[label] = {
            "capped": _median(qs[capped], spark, d),
            "uncapped": _median(qs[uncapped], spark, d),
        }
    print(json.dumps({"sf_dir": d, "runs": RUNS, "pairs": out}))
    spark.stop()


if __name__ == "__main__":
    main()
