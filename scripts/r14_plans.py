"""Dump full `.explain("formatted")` plans for the r14 optimization
round's evidence files (plans/r14/<query>_<tag>.txt).

Usage: python scripts/r14_plans.py <tag> [query ...]

The headline six are dumped under the BENCH ref_confs (AQE off,
8 shuffle partitions, 256k splits — the config they are timed under),
everything else under the session defaults, matching what the bench
actually measures.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from sqlondataframesr_spark import registry  # noqa: E402
from sqlondataframesr_spark.materialize import release_all  # noqa: E402
from sqlondataframesr_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

REF_NAMES = {
    "q1_yearly_top_order",
    "q2_top_customers_by_spend",
    "q3_top_orders_by_big_items",
    "q4_price_spread",
    "q5_user_event_totals",
    "q6_distinct_suppliers_of_qualifying_brands",
}

# must mirror bench.py's ref_confs (the conf set the six are timed
# under); the r14 "before" dumps were taken with the r12 set
# (256k splits, default join confs) — that is the point of the diff
REF_CONFS = {
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.shuffle.partitions": "8",
    "spark.sql.files.maxPartitionBytes": "1m",
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.autoBroadcastJoinThreshold": "1048576",
}

DEFAULT_SELECTION = sorted(REF_NAMES) + [
    "ann_recall_report",
    "ret_rank_agreement",
    "ml_perceptron_confusion",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT_SELECTION
    out_dir = os.path.join(ROOT, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"r14-plans-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    defaults = {k: spark.conf.get(k) for k in REF_CONFS}
    for name in names:
        confs = REF_CONFS if name in REF_NAMES else defaults
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}", flush=True)
        release_all()
    spark.stop()


if __name__ == "__main__":
    main()
