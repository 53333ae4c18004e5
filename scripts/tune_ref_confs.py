"""Conf-grid A/B for the headline six under the frozen ab_headline
protocol (7-run medians, warm JVM): current ref_confs vs candidates
that steer the orders-side joins from driver-built broadcast to
shuffled-hash (guide §3.1/§9) and resize scan splits (§6).
Usage: python scripts/tune_ref_confs.py"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
from sqlondataframesr_spark import registry  # noqa: E402
from sqlondataframesr_spark.materialize import release_all  # noqa: E402
from sqlondataframesr_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"
NAMES = [
    "q1_yearly_top_order", "q2_top_customers_by_spend",
    "q3_top_orders_by_big_items", "q4_price_spread",
    "q5_user_event_totals", "q6_distinct_suppliers_of_qualifying_brands",
]
BASE = {
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.shuffle.partitions": "8",
    "spark.sql.files.maxPartitionBytes": "256k",
    "spark.sql.join.preferSortMergeJoin": "true",
    "spark.sql.autoBroadcastJoinThreshold": "10485760",
}
GRIDS = {
    "current": {},
    "shj1m": {"spark.sql.join.preferSortMergeJoin": "false",
              "spark.sql.autoBroadcastJoinThreshold": "1048576"},
    "shj1m_1msplit": {"spark.sql.join.preferSortMergeJoin": "false",
                      "spark.sql.autoBroadcastJoinThreshold": "1048576",
                      "spark.sql.files.maxPartitionBytes": "1m"},
    "shj1m_4msplit": {"spark.sql.join.preferSortMergeJoin": "false",
                      "spark.sql.autoBroadcastJoinThreshold": "1048576",
                      "spark.sql.files.maxPartitionBytes": "4m"},
    "cur_4msplit": {"spark.sql.files.maxPartitionBytes": "4m"},
    "shj1m_4msplit_sp16": {"spark.sql.join.preferSortMergeJoin": "false",
                           "spark.sql.autoBroadcastJoinThreshold": "1048576",
                           "spark.sql.files.maxPartitionBytes": "4m",
                           "spark.sql.shuffle.partitions": "16"},
}

spark = get_spark(app_name="tune-ref-confs", cpus=32, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
qs = registry.queries()
for n in NAMES:  # global warm
    qs[n](spark, SF).toPandas()
    release_all()

for gname, over in GRIDS.items():
    confs = {**BASE, **over}
    for k, v in confs.items():
        spark.conf.set(k, v)
    tot = 0.0
    per = {}
    for n in NAMES:
        fn = qs[n]
        fn(spark, SF).toPandas()
        release_all()
        s = []
        for _ in range(7):
            t0 = time.perf_counter()
            fn(spark, SF).toPandas()
            s.append(time.perf_counter() - t0)
            release_all()
        med = statistics.median(s)
        per[n.split("_")[0]] = round(med, 3)
        tot += med
    print(gname, "SUM", round(tot, 4), per, flush=True)
spark.stop()
