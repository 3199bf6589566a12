"""Isolated per-query cost probe (r13 optimization methodology).

Fresh session, Python-worker + JIT warmup, N reps; prints per-rep
wall AND the executorRunTime (core-seconds) diff from the status
store — the number that survives this box's +-30% wall noise and is
what a lower-core-count bench divides by the core count.

Usage: python scripts/probe_query_cost.py <query> [<query> ...] [--reps=N]
Env: SPARK_GRAFT_CPUS (master core count), default sf dir sf0.1.
"""
import sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

args = [a for a in sys.argv[1:] if not a.startswith("--")]
reps = 3
for a in sys.argv[1:]:
    if a.startswith("--reps="):
        reps = int(a.split("=")[1])

from kafka_streams_sandbox_spark.registry import all_queries
from kafka_streams_sandbox_spark.session import get_spark

spark = get_spark(app_name="probe-clean")
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext
store = sc._jsc.sc().statusStore()
_E = sc._jvm.java.util.ArrayList(); _E2 = sc._jvm.java.util.ArrayList()
gw = sc._gateway; _D = gw.new_array(gw.jvm.double, 0)

def taskms():
    sl = store.stageList(_E, False, False, _D, _E2)
    return sum(sl.apply(i).executorRunTime() for i in range(sl.size()))

import pandas as _pd
qs = all_queries()
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
qs["b02_tpch_q1_agg"](spark, sf).write.format("noop").mode("overwrite").save()
spark.range(3200).repartition(32).mapInPandas(lambda it: iter([_pd.DataFrame({"id": [0]})]), "id long").write.format("noop").mode("overwrite").save()

for name in args:
    fn = qs[name]
    walls, tasks = [], []
    for _ in range(reps):
        m0 = taskms(); t0 = time.perf_counter()
        fn(spark, sf).write.format("noop").mode("overwrite").save()
        walls.append(time.perf_counter() - t0)
        tasks.append((taskms() - m0) / 1000.0)
    print(f"{name:42s} wall_best={min(walls):6.2f} walls={[round(w,2) for w in walls]} task_s={[round(t,1) for t in tasks]}", flush=True)
