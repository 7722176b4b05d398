"""Dump .explain("formatted") for named queries into plans/r13/.

Usage: python tools/dump_plan_r13.py before|after query [query ...]

Writes plans/r13/<query>_<tag>.txt with the FORMATTED physical plan of
the DataFrame the contract query returns (the driver-checked result
frame). Queries whose construction runs eager work (adaptive counts,
export writes) pay it here too — the dump reflects exactly what the
bench times. sf dir: $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1.
"""

import os
import sys

# SPARK_GRAFT_REPO lets the before/after pair come from two checkouts
# (worktree at the pre-change commit vs the working tree) while both
# write into the repo's plans/r13/.
sys.path.insert(0, os.environ.get("SPARK_GRAFT_REPO", "/root/repo"))

from _event_intelligence_data_warehouse_spark import cache  # noqa: E402
from _event_intelligence_data_warehouse_spark.contract import QUERIES  # noqa: E402
from _event_intelligence_data_warehouse_spark.session import get_spark  # noqa: E402

tag = sys.argv[1]
names = sys.argv[2:]
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
out_dir = os.path.join("/root/repo", "plans", "r13")
os.makedirs(out_dir, exist_ok=True)

spark = get_spark("eidw-plan-dump")
spark.sparkContext.setLogLevel("ERROR")
for name in names:
    df = QUERIES[name](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(out_dir, f"{name}_{tag}.txt")
    with open(path, "w") as f:
        f.write(plan)
    print(f"wrote {path} ({len(plan)} chars, "
          f"{plan.count('Exchange')} Exchange)", flush=True)
    cache.release_all()
spark.stop()
