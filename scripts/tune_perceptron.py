"""Where do ml_perceptron_*'s ~3 s go when executor CPU is ~0.2 s?
Variants, one session (default confs — the bench times these as
extensions): (a) current (lazy localCheckpoint per round), (b) no
checkpoint at all (nested lazy plans, one action), (c) eager
localCheckpoint. Also times the OvR query as-is."""
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F  # noqa: E402

from sqlondataframesr_spark.llm import linear  # noqa: E402
from sqlondataframesr_spark.materialize import materialize, release_all  # noqa: E402
from sqlondataframesr_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="tune-perceptron")
spark.sparkContext.setLogLevel("ERROR")
DIM = linear.DIM


def _train_variant(spark, sf_dir, ckpt: str):
    qv = materialize(linear._quantized(spark, sf_dir))
    w = spark.range(1).select(
        F.expr(f"array_repeat(0L, {DIM})").alias("ws"),
        F.lit(0).cast("long").alias("b"),
    )
    curve_rows = []
    for t in range(1, linear.PC_ROUNDS + 1):
        scored = qv.crossJoin(F.broadcast(w)).withColumn(
            "mg",
            F.expr(
                "aggregate(zip_with(xq, ws, (x, wi) -> x * wi), 0L,"
                " (acc, e) -> acc + e) + b"
            ),
        )
        mis = scored.filter(F.expr("y * mg <= 0"))
        upd = mis.agg(
            F.count(F.lit(1)).cast("long").alias("nm"),
            F.coalesce(F.sum("y"), F.lit(0)).cast("long").alias("db"),
            *[
                F.coalesce(F.sum(F.expr(f"y * element_at(xq, {i + 1})")), F.lit(0))
                .cast("long")
                .alias(f"d{i}")
                for i in range(DIM)
            ],
        )
        w = w.crossJoin(upd).select(
            F.array(
                *[F.expr(f"element_at(ws, {i + 1}) + d{i}") for i in range(DIM)]
            ).alias("ws"),
            (F.col("b") + F.col("db")).cast("long").alias("b"),
            F.col("nm"),
        )
        if ckpt == "lazy":
            w = w.localCheckpoint(eager=False)
        elif ckpt == "eager":
            w = w.localCheckpoint(eager=True)
        curve_rows.append(
            w.select(
                F.lit(t).cast("long").alias("round"),
                F.col("nm").alias("n_mistakes"),
                F.expr(
                    "aggregate(transform(ws, x -> abs(x)), 0L, (acc, e) -> acc + e)"
                )
                .cast("long")
                .alias("w_l1"),
                F.col("b").alias("bias"),
            )
        )
        w = w.drop("nm")
    out = curve_rows[0]
    for r in curve_rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("round")


def run(name, fn, n=5):
    fn().toPandas()
    release_all()
    s = []
    for _ in range(n):
        t0 = time.perf_counter()
        res = fn().toPandas()
        s.append(time.perf_counter() - t0)
        release_all()
    print(
        name,
        round(statistics.median(s), 3),
        [round(x, 3) for x in s],
        flush=True,
    )
    return res


r_lazy = run("curve_lazy_ckpt(current)", lambda: _train_variant(spark, SF, "lazy"))
r_none = run("curve_no_ckpt", lambda: _train_variant(spark, SF, "none"))
r_eager = run("curve_eager_ckpt", lambda: _train_variant(spark, SF, "eager"))
print("no_ckpt == lazy:", r_none.equals(r_lazy), "eager == lazy:", r_eager.equals(r_lazy))
run("ml_perceptron_confusion(current)", lambda: linear.ml_perceptron_confusion(spark, SF))
run("ml_perceptron_ovr(current)", lambda: linear.ml_perceptron_ovr_confusion(spark, SF))
spark.stop()
