"""Run plan_audit's exact counting for one query name at sf0.01."""
import sys
import time

sys.path.insert(0, "/root/repo")
from _event_intelligence_data_warehouse_spark import cache  # noqa: E402
from _event_intelligence_data_warehouse_spark.contract import QUERIES  # noqa: E402
from _event_intelligence_data_warehouse_spark.session import get_spark  # noqa: E402

name = sys.argv[1]
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
spark = get_spark("eidw-audit-one")
spark.sparkContext.setLogLevel("ERROR")
t0 = time.time()
df = QUERIES[name](spark, sf_dir)
df.collect()
dt = round(time.time() - t0, 3)
plan = df._jdf.queryExecution().executedPlan().toString()
full = plan.count("Exchange")
plan_cut = plan.split("== Initial Plan ==")[0]
print(f"RESULT {name}: {dt}s exchanges(audit-method)={plan_cut.count('Exchange')} "
      f"exchanges(fullstring)={full} planlen={len(plan)}", flush=True)
cache.release_all()
spark.stop()
