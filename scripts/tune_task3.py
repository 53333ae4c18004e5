"""Round-8 profiling: where do se100_task3's 0.42 s go, and is the
q3 fluent-vs-SQL 0.13 s gap real or a measurement-order artifact?

HISTORICAL RECORD — the numbers in SCALE.md were measured BEFORE
load_se gained its per-session relation cache (which this script's
findings motivated). Re-running steps 1-3 today measures cache hits,
not the original 7x read_csv cost; to reproduce the original
measurements, clear ``stackexchange._se_cache`` between calls.

Run: python scripts/tune_task3.py
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from sqlondataframesr_spark.queries import stackexchange as se
from sqlondataframesr_spark.queries import reference as ref
from sqlondataframesr_spark.catalog import register_views
from sqlondataframesr_spark.materialize import release_all
from sqlondataframesr_spark.session import get_spark

N = 11


def med(fn, n=N):
    fn()
    s = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        s.append(time.perf_counter() - t0)
        release_all()
    return round(statistics.median(s), 4), round(min(s), 4), round(max(s), 4)


def main():
    spark = get_spark(app_name="tune_task3")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    se_dir = se.fixture_dir(scale=100)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # --- 1. load_se alone (7x read_csv + createOrReplaceTempView) ---
    print("load_se alone:", med(lambda: se.load_se(spark, se_dir), 7))

    # --- 2. task3 as-is ---
    print("task3 as-is:", med(lambda: se.task3_top_positive_answer_counts(spark, se_dir).toPandas()))

    # --- 3. task3 with tables loaded once (outside timed region) ---
    t = se.load_se(spark, se_dir)

    def task3_pre(tabs):
        posts2 = (
            tabs["Posts"]
            .filter((F.col("PostTypeId") == 2) & (F.col("Score") > 0))
            .groupBy("ParentId")
            .agg(F.count(F.lit(1)).alias("PositiveAnswerCount"))
        )
        return (
            tabs["Posts"].alias("p")
            .join(posts2.alias("p2"), F.col("p.Id") == F.col("p2.ParentId"))
            .select(F.col("p.Id").alias("Id"), "p.Title", "p2.PositiveAnswerCount")
            .orderBy(F.desc("PositiveAnswerCount"), F.asc("Id"))
            .limit(10)
        )

    print("task3 preloaded:", med(lambda: task3_pre(t).toPandas()))

    # --- 4. task3 over a one-time parquet conversion of the fixture ---
    pq_dir = se_dir + "_pq"
    if not os.path.isdir(pq_dir):
        os.makedirs(pq_dir, exist_ok=True)
        for name in se.SCHEMAS:
            se_df = spark.read.csv(
                os.path.join(se_dir, f"{name}.csv"), header=True, schema=se.SCHEMAS[name]
            )
            se_df.write.mode("overwrite").parquet(os.path.join(pq_dir, f"{name}.parquet"))
    tp = {n: spark.read.parquet(os.path.join(pq_dir, f"{n}.parquet")) for n in se.SCHEMAS}
    print("task3 parquet:", med(lambda: task3_pre(tp).toPandas()))

    # --- 5. task3 SQL dual on Spark (views over CSV) ---
    sql = """
    WITH Posts2 AS (
      SELECT ParentId, COUNT(*) AS PositiveAnswerCount
      FROM Posts WHERE PostTypeId = 2 AND Score > 0 GROUP BY ParentId
    )
    SELECT p.Id, p.Title, Posts2.PositiveAnswerCount
    FROM Posts p JOIN Posts2 ON p.Id = Posts2.ParentId
    ORDER BY Posts2.PositiveAnswerCount DESC, p.Id
    LIMIT 10
    """
    se.load_se(spark, se_dir)
    print("task3 spark_sql(csv views):", med(lambda: spark.sql(sql).toPandas()))

    # --- 6. q3 fluent vs spark_sql interleaved, sf0.1 parquet ---
    register_views(spark, sf_dir)
    q3sql = ref.Q3_SPARK_SQL
    fl, sq = [], []
    ref.q3_top_orders_by_big_items(spark, sf_dir).toPandas()
    spark.sql(q3sql).toPandas()
    for _ in range(N):
        t0 = time.perf_counter()
        ref.q3_top_orders_by_big_items(spark, sf_dir).toPandas()
        fl.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        spark.sql(q3sql).toPandas()
        sq.append(time.perf_counter() - t0)
    print("q3 fluent interleaved:", round(statistics.median(fl), 4), round(min(fl), 4), round(max(fl), 4))
    print("q3 sql    interleaved:", round(statistics.median(sq), 4), round(min(sq), 4), round(max(sq), 4))
    spark.stop()


if __name__ == "__main__":
    main()
