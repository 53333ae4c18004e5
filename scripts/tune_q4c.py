"""q4: does a lazy localCheckpoint before the global sort beat the
plain orderBy (range-sampling re-executes the join subtree)?"""
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
spark = get_spark(app_name="tune-q4c")
spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")


def joined(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    per_order = li.groupBy("l_orderkey").agg(
        F.max("l_extendedprice").alias("max_price"),
        F.min(F.when(F.col("l_linenumber") == 1, F.col("l_extendedprice"))).alias(
            "first_price"
        ),
    )
    spread = (
        per_order.filter(F.col("first_price").isNotNull())
        .withColumn("price_spread", F.col("max_price") - F.col("first_price"))
        .filter(F.col("price_spread") > 1000)
    )
    return spread.join(orders, F.col("l_orderkey") == orders.o_orderkey).select(
        "o_orderkey", "o_orderpriority", "max_price", "first_price", "price_spread"
    )


def full_ckpt(spark, sf_dir):
    return (
        joined(spark, sf_dir)
        .localCheckpoint(eager=False)
        .orderBy(F.col("price_spread").desc(), F.col("o_orderkey").asc())
    )


def run(label, fn):
    fn(spark, SF).toPandas()
    s = []
    for _ in range(7):
        t0 = time.perf_counter()
        fn(spark, SF).toPandas()
        s.append(time.perf_counter() - t0)
    print(label, round(statistics.median(s), 3), [round(x, 3) for x in s], flush=True)


run("full_cur", q4_price_spread)
run("full_ckpt", full_ckpt)
run("full_cur2", q4_price_spread)
run("full_ckpt2", full_ckpt)
spark.stop()
