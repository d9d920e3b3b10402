"""Attribution bench: 5-trial foreground medians for named queries at a
given SF — the methodology used to root-cause the r4 gl_enrichment and r5
minhash/simhash bench-series alarms (single/dual-trial walls on a shared
box swing ±40-80%).

    python tools/attrib_bench.py dedup_minhash_lsh dedup_simhash
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:] or ["dedup_minhash_lsh", "dedup_simhash"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    trials = int(os.environ.get("SPARK_GRAFT_TRIALS", "5"))

    from ssg_etl_spark.cache import release_tracked
    from ssg_etl_spark.plans.registry import load_all
    from ssg_etl_spark.session import get_spark

    spark = get_spark("attrib-bench", master="local[32]", shuffle_partitions=32)
    qs = load_all(include_extra=True)
    # Warm-up (executors + scan JIT), untimed.
    qs["kpi_totals"].builder(spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()

    out = {}
    for name in names:
        walls = []
        for _ in range(trials):
            t0 = time.time()
            qs[name].builder(spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            walls.append(round(time.time() - t0, 3))
            release_tracked()
        out[name] = {
            "trials": walls,
            "median": round(statistics.median(walls), 3),
            "min": round(min(walls), 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
