"""Per-stage wall/CPU decomposition of the headline queries under the
bench ref_confs: which stage (and how much driver gap between stages)
a sub-second query actually spends its time in.

For each query: run warm-ups, then one instrumented run; print every
stage's (submission..completion) wall, executorRunTime, executorCpuTime
and the job-level gaps. Usage: python scripts/stagebreak.py q3 q4 ...
"""

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")
from sqlondataframesr_spark import registry  # noqa: E402
from sqlondataframesr_spark.materialize import release_all  # noqa: E402
from sqlondataframesr_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NAMES = {
    "q1": "q1_yearly_top_order",
    "q2": "q2_top_customers_by_spend",
    "q3": "q3_top_orders_by_big_items",
    "q4": "q4_price_spread",
    "q5": "q5_user_event_totals",
    "q6": "q6_distinct_suppliers_of_qualifying_brands",
}

spark = get_spark(app_name="stagebreak")
spark.sparkContext.setLogLevel("ERROR")
for k, v in {
    "spark.sql.adaptive.enabled": "false",
    "spark.sql.shuffle.partitions": "8",
    "spark.sql.files.maxPartitionBytes": "256k",
}.items():
    spark.conf.set(k, v)

qs = registry.queries()


def stages_after(floor_id):
    ss = spark.sparkContext._jsc.sc().statusStore()
    jvm = spark.sparkContext._jvm
    gw = spark.sparkContext._gateway
    stages = ss.stageList(
        jvm.java.util.ArrayList(), False, False,
        gw.new_array(jvm.double, 0), jvm.java.util.ArrayList(),
    )
    out = []
    for i in range(stages.size()):
        s = stages.apply(i)
        if s.stageId() > floor_id and str(s.status()) == "COMPLETE":
            sub = s.submissionTime().get().getTime()
            comp = s.completionTime().get().getTime()
            out.append((
                s.stageId(),
                comp - sub,
                s.executorRunTime(),
                round(s.executorCpuTime() / 1e6),
                s.numCompleteTasks(),
                s.name().split(" ")[0],
            ))
    return sorted(out)


for arg in sys.argv[1:] or list(NAMES):
    name = NAMES.get(arg, arg)
    fn = qs[name]
    for _ in range(6):  # warm-up: get past JIT
        fn(spark, SF).toPandas()
        release_all()
    samples = []
    for _ in range(9):
        t0 = time.perf_counter()
        fn(spark, SF).toPandas()
        samples.append(time.perf_counter() - t0)
        release_all()
    med = statistics.median(samples)
    floor = max((s[0] for s in stages_after(-1)), default=-1)
    t0 = time.perf_counter()
    fn(spark, SF).toPandas()
    wall = time.perf_counter() - t0
    rows = stages_after(floor)
    stage_wall = sum(r[1] for r in rows)
    print(f"\n=== {name}: median {med:.3f}s (probe run {wall:.3f}s, "
          f"stage-wall sum {stage_wall/1000:.3f}s, "
          f"driver/gaps {wall - stage_wall/1000:.3f}s)")
    for sid, w, rt, cpu, nt, nm in rows:
        print(f"  stage {sid:4d} {nm:20s} wall={w:5d}ms execRun={rt:5d}ms "
              f"cpu={cpu:5d}ms tasks={nt}")
spark.stop()
