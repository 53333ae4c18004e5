"""Quantify q4's fixed-stage floor and sort-cost levers, one session."""
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F  # noqa: E402

from sqlondataframesr_spark.catalog import load_table  # noqa: E402
from sqlondataframesr_spark.queries.reference import q4_price_spread  # noqa: E402
from sqlondataframesr_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="tune-q4b")
spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")


def bare_scan(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_linenumber", "l_extendedprice").groupBy().count()


def agg(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.max("l_extendedprice").alias("max_price"),
            F.min(F.when(F.col("l_linenumber") == 1, F.col("l_extendedprice"))).alias(
                "first_price"
            ),
        )
        .filter(F.col("first_price").isNotNull())
        .withColumn("price_spread", F.col("max_price") - F.col("first_price"))
        .filter(F.col("price_spread") > 1000)
    )


def full_repart_sort(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    j = agg(spark, sf_dir).join(orders, F.col("l_orderkey") == orders.o_orderkey).select(
        "o_orderkey", "o_orderpriority", "max_price", "first_price", "price_spread"
    )
    return j.repartition(1).sortWithinPartitions(
        F.col("price_spread").desc(), F.col("o_orderkey").asc()
    )


def run(label, fn, confs=None):
    for k, v in (confs or {}).items():
        spark.conf.set(k, v)
    fn(spark, SF).toPandas()
    s = []
    for _ in range(7):
        t0 = time.perf_counter()
        fn(spark, SF).toPandas()
        s.append(time.perf_counter() - t0)
    print(label, round(statistics.median(s), 3), [round(x, 3) for x in s], flush=True)
    for k in confs or {}:
        spark.conf.set(k, "32" if "partitions" in k else spark.conf.get(k))


run("bare_scan", bare_scan)
run("agg_sp32", agg)
run("agg_sp1", agg, {"spark.sql.shuffle.partitions": "1"})
spark.conf.set("spark.sql.shuffle.partitions", "32")
run("full_cur", q4_price_spread)
run("full_repart1", full_repart_sort)
spark.stop()
