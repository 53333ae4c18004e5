"""A/B the q3 limit-pushdown-through-FK-join rewrite vs the current
plan, under bench.py's exact headline confs (AQE off, 8 shuffle
partitions, warm JVM, toPandas materialization, median of 11)."""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sqlondataframesr_spark.catalog import load_table
from sqlondataframesr_spark.queries.reference import q3_top_orders_by_big_items
from sqlondataframesr_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def q3_limit_pushdown(spark, sf_dir):
    """Top-10 of counts is fully determined pre-join (sort key =
    (n_big_items, l_orderkey) and the join is FK 1:1), so take the
    top-10 FIRST, then broadcast those 10 rows into the orders probe."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    top = (
        lineitem.filter(F.col("l_quantity") > 25)
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_big_items"))
        .orderBy(F.col("n_big_items").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )
    return (
        orders.join(F.broadcast(top), top.l_orderkey == orders.o_orderkey)
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "n_big_items")
        .orderBy(F.col("n_big_items").desc(), F.col("o_orderkey").asc())
    )


def main():
    spark = get_spark(app_name="tune_q3")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    variants = {
        "current": q3_top_orders_by_big_items,
        "limit_pushdown": q3_limit_pushdown,
    }
    # warm everything first
    for fn in variants.values():
        fn(spark, SF).toPandas()
    base = variants["current"](spark, SF).toPandas()
    alt = variants["limit_pushdown"](spark, SF).toPandas()
    assert base.values.tolist() == alt.values.tolist(), "rewrite changed results!"

    for name, fn in variants.items():
        s = []
        for _ in range(11):
            t0 = time.perf_counter()
            fn(spark, SF).toPandas()
            s.append(time.perf_counter() - t0)
        print(f"{name}: median={statistics.median(s):.4f} "
              f"min={min(s):.4f} max={max(s):.4f}")


if __name__ == "__main__":
    main()
