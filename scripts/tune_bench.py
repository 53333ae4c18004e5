"""Back-to-back config comparison for the six headline queries at
sf0.1 — run within ONE session so host noise can't masquerade as a
config effect (see memory: never compare across separate runs)."""
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
from sqlondataframesr_spark import registry  # noqa: E402
from sqlondataframesr_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REF = [
    "q1_yearly_top_order",
    "q2_top_customers_by_spend",
    "q3_top_orders_by_big_items",
    "q4_price_spread",
    "q5_user_event_totals",
    "q6_distinct_suppliers_of_qualifying_brands",
]

spark = get_spark(app_name="tune")
qs = registry.queries()

# global warm-up
for n in REF:
    qs[n](spark, SF).toPandas()

PF = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
ADV = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
AQE = "spark.sql.adaptive.enabled"
SP = "spark.sql.shuffle.partitions"
for label, confs in [
    ("cur", {SP: "32", PF: "false", ADV: "8m", AQE: "true"}),
    ("aqeoff32", {SP: "32", AQE: "false"}),
    ("aqeoff16", {SP: "16", AQE: "false"}),
    ("aqeoff8", {SP: "8", AQE: "false"}),
    ("cur2", {SP: "32", PF: "false", ADV: "8m", AQE: "true"}),
]:
    for k, v in confs.items():
        spark.conf.set(k, v)
    tot = 0.0
    per = {}
    for n in REF:
        qs[n](spark, SF).toPandas()  # warm under this conf
        samples = []
        for _ in range(5):
            t0 = time.perf_counter()
            qs[n](spark, SF).toPandas()
            samples.append(time.perf_counter() - t0)
        med = statistics.median(samples)
        per[n] = round(med, 3)
        tot += med
    print(label, round(tot, 3), per, flush=True)
spark.stop()
