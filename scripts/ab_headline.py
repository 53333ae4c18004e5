"""Bench-protocol timing of the six headline queries on a given tree —
the FROZEN cross-tree A/B protocol (e3f920a): same confs, same warm-up,
same median-of-7, whatever tree is passed in, so two trees' numbers are
comparable on an idle machine.
Usage: python scripts/ab_headline.py <repo_root>"""
import statistics, sys, time

root = sys.argv[1]
sys.path.insert(0, root)
from sqlondataframesr_spark.session import get_spark
import sqlondataframesr_spark.registry as registry
from sqlondataframesr_spark.materialize import release_all

spark = get_spark(app_name="time-six", cpus=32, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
SF = "/root/testdata/sf0.1"
NAMES = ["q1_yearly_top_order", "q2_top_customers_by_spend",
         "q3_top_orders_by_big_items", "q4_price_spread",
         "q5_user_event_totals", "q6_distinct_suppliers_of_qualifying_brands"]
qs = registry.queries()
# warm
for n in NAMES:
    qs[n](spark, SF).toPandas()
# the bench ref_confs, set explicitly so every tree runs identically
for k, v in {"spark.sql.adaptive.enabled": "false",
             "spark.sql.shuffle.partitions": "8",
             "spark.sql.files.maxPartitionBytes": "256k"}.items():
    spark.conf.set(k, v)
tot = 0.0
for n in NAMES:
    fn = qs[n]
    fn(spark, SF).toPandas(); release_all()
    samples = []
    for _ in range(7):
        t0 = time.perf_counter()
        fn(spark, SF).toPandas()
        samples.append(time.perf_counter() - t0)
        release_all()
    med = statistics.median(samples)
    tot += med
    print(n, round(med, 4), [round(s, 3) for s in samples], flush=True)
print("SUM", round(tot, 4))
