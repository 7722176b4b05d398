"""Three-point scaling curve for dedup_containment_pairs (r8 verdict
item 6): is the 9.2x sf0.1->sf1 time ratio a super-linear term, or the
honest candidate workload of a corpus whose near-dup structure
replicates 10x by construction?

Measures, at sf0.1 / sf0.3 / sf1 (the scaled SFs built by
tools/make_scaled_sf.py --copies {3,10}):
- LSH banding candidate-pair count (the join's real workload),
- surviving containment pairs,
- wall time of the full query through the noop sink.

If candidates grow ~linearly in copies (3x data -> ~3x candidates,
10x -> ~10x) the verify join is linear in its workload and the time
ratio is attribution-closed; a super-linear candidate curve would
instead demand a banding/prefix parameter that scales with n.

Usage: python tools/containment_curve.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)

POINTS = [
    ("sf0.1", "/root/testdata/sf0.1", 1),
    ("sf0.3", f"{REPO}/.scaled/sf03", 3),
    ("sf1", f"{REPO}/.scaled/sf1", 10),
]


def main() -> None:
    for _, path, copies in POINTS:
        if not os.path.exists(os.path.join(path, "documents.parquet")):
            subprocess.run(
                [sys.executable, f"{REPO}/tools/make_scaled_sf.py",
                 "--copies", str(copies), "--out", path],
                check=True,
            )

    from pyspark.sql import SparkSession

    from _event_intelligence_data_warehouse_spark import cache
    from _event_intelligence_data_warehouse_spark.operators import (
        dedup as dd,
    )

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .appName("containment-curve")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for label, path, copies in POINTS:
        docs = spark.read.parquet(os.path.join(path, "documents.parquet"))
        sets_ = dd.doc_token_sets(docs)
        sigs = cache.persist(dd.minhash_signatures(sets_))
        bands = dd.bands_for_threshold(0.8)
        n_cand = dd.minhash_lsh_candidates(sigs, bands=bands).count()
        cache.release_all()
        t0 = time.time()
        out = dd.containment_pairs(docs, threshold=0.8)
        out.write.mode("overwrite").format("noop").save()
        dt = round(time.time() - t0, 1)
        n_pairs = out.count()
        cache.release_all()
        rows.append(
            {"sf": label, "copies": copies, "candidates": n_cand,
             "pairs": n_pairs, "sec": dt}
        )
        print(json.dumps(rows[-1]), flush=True)

    base = rows[0]
    print("\ncurve (vs sf0.1):")
    for r in rows:
        print(
            f"  {r['sf']}: {r['copies']}x docs -> "
            f"{r['candidates'] / max(1, base['candidates']):.2f}x candidates, "
            f"{r['pairs'] / max(1, base['pairs']):.2f}x pairs, "
            f"{r['sec'] / max(0.1, base['sec']):.2f}x time"
        )


if __name__ == "__main__":
    main()
