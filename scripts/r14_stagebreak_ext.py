"""Per-stage wall/CPU decomposition for EXTENSION operators under the
session DEFAULT confs (the confs the bench times them with) — the
r14 loop-audit tool (VERDICT r13 item 6). Unlike scripts/stagebreak.py
(headline six under ref_confs), this leaves the session untouched and
also prints the number of JOBS the query ran (driver round-trips).

Usage: python scripts/r14_stagebreak_ext.py query [query ...]
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

spark = get_spark(app_name="r14-stagebreak-ext")
spark.sparkContext.setLogLevel("ERROR")
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


def job_count():
    ss = spark.sparkContext._jsc.sc().statusStore()
    jl = ss.jobsList(None)
    return jl.size()


for arg in sys.argv[1:]:
    fn = qs[arg]
    for _ in range(2):
        fn(spark, SF).toPandas()
        release_all()
    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        fn(spark, SF).toPandas()
        samples.append(time.perf_counter() - t0)
        release_all()
    med = statistics.median(samples)
    floor = max((s[0] for s in stages_after(-1)), default=-1)
    j0 = job_count()
    t0 = time.perf_counter()
    fn(spark, SF).toPandas()
    wall = time.perf_counter() - t0
    rows = stages_after(floor)
    n_jobs = job_count() - j0
    release_all()
    stage_wall = sum(r[1] for r in rows)
    print(f"\n=== {arg}: median {med:.3f}s (probe run {wall:.3f}s, "
          f"stage-wall sum {stage_wall/1000:.3f}s, "
          f"driver/gaps {wall - stage_wall/1000:.3f}s, jobs {n_jobs})")
    for sid, w, rt, cpu, nt, nm in rows:
        print(f"  stage {sid:5d} {nm:22s} wall={w:6d}ms execRun={rt:6d}ms "
              f"cpu={cpu:6d}ms tasks={nt}")
spark.stop()
