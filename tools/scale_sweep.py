"""Spark-only scale sweep: run every contract query at a given SF through
the noop sink (full plan executes, nothing materializes to the driver)
and print per-query wall time, slowest first.

Complements tools/check_oracle.py: the oracle gate proves CORRECTNESS at
sf0.01; this proves the Spark side stays healthy at larger SFs without
waiting on DuckDB (whose recursive-CTE oracles are the bottleneck at
sf0.1 — see memory/SCALE.md).

Usage: python tools/scale_sweep.py [sf_dir] [query ...]
(no query names = sweep every registered query)
"""

from __future__ import annotations

import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from _event_intelligence_data_warehouse_spark.contract import QUERIES
    from _event_intelligence_data_warehouse_spark.session import get_spark

    spark = get_spark("scale-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm JVM + footers so the first query doesn't absorb startup.
    QUERIES["agg_orders_by_priority"](spark, sf_dir).write.mode(
        "overwrite"
    ).format("noop").save()

    from _event_intelligence_data_warehouse_spark import cache

    wanted = sys.argv[2:]
    if wanted:
        unknown = [q for q in wanted if q not in QUERIES]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")
    results = []
    for name in (sorted(wanted) if wanted else sorted(QUERIES)):
        t0 = time.time()
        try:
            QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            results.append((round(time.time() - t0, 2), name, "ok"))
        except Exception as e:  # surface, keep sweeping
            results.append(
                (round(time.time() - t0, 2), name, f"ERR {type(e).__name__}")
            )
        finally:
            # Per-query isolation: a sweep holds the longest-lived session
            # of any harness; retained operator persists would put later
            # queries under LRU pressure and skew their timings.
            cache.release_all()
    failures = 0
    for dt, name, status in sorted(results, reverse=True):
        print(f"SWEEP {dt:8.2f}  {name}  {status}")
        failures += status != "ok"
    print(f"SWEEP {len(results)} queries, {failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
