"""Deterministic job/stage/task profile for named contract queries.

Usage: python tools/profile_query.py query [query ...]

For each query: runs it once to the noop sink (guide §1.4) in a fresh
cache state and reports jobs, stages, tasks and wall seconds via
sparkContext.statusTracker() deltas — the drift-free structural
evidence the r12/r13 optimization notes use alongside order-balanced
wall-clock A/Bs. sf dir: $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.environ.get("SPARK_GRAFT_REPO", "/root/repo"))

from _event_intelligence_data_warehouse_spark import cache  # noqa: E402
from _event_intelligence_data_warehouse_spark.contract import QUERIES  # noqa: E402
from _event_intelligence_data_warehouse_spark.session import get_spark  # noqa: E402

names = sys.argv[1:]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark("eidw-profile")
spark.sparkContext.setLogLevel("ERROR")
tracker = spark.sparkContext.statusTracker()


def _tasks(job_ids) -> int:
    n = 0
    for j in job_ids:
        info = tracker.getJobInfo(j)
        if info is None:
            continue
        for s in info.stageIds:
            si = tracker.getStageInfo(s)
            if si is not None:
                n += si.numTasks
    return n


out = {}
for name in names:
    spark.sparkContext.setJobDescription(f"profile: {name}")
    before = set(tracker.getJobIdsForGroup())
    t0 = time.time()
    QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    dt = round(time.time() - t0, 3)
    after = set(tracker.getJobIdsForGroup())
    new = sorted(after - before)
    out[name] = {
        "jobs": len(new),
        "tasks": _tasks(new),
        "wall_s": dt,
    }
    print(f"{name}: jobs={len(new)} tasks={out[name]['tasks']} "
          f"wall={dt}s", flush=True)
    cache.release_all()

print(json.dumps(out))
spark.stop()
