"""Full-registry wall-time sweep: every registered query (public + extra)
forced with a noop write at the given scale factor, cold (cache cleared
between queries), slowest first. The scale-audit companion to bench.py's
median-of-3 headline set — COVERAGE.md's sweep numbers come from here.

Usage:  python tools/sweep.py [sf_dir] [trials]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    from ssg_etl_spark.plans.registry import load_all
    from ssg_etl_spark.session import get_spark

    spark = get_spark("sweep", shuffle_partitions=None)
    specs = load_all(include_extra=True)
    # Untimed warm-up (JVM spin-up would otherwise land on the first query).
    specs["kpi_totals"].builder(spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()

    walls: dict[str, float | str] = {}
    errors = 0
    for name, spec in specs.items():
        t = []
        try:
            for _ in range(trials):
                t0 = time.time()
                spec.builder(spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                t.append(time.time() - t0)
                # Deterministic cache lifecycle: drop the persist handles the
                # query's operators registered, then clear anything else.
                from ssg_etl_spark.cache import release_tracked

                release_tracked()
                spark.catalog.clearCache()
            walls[name] = round(statistics.median(t), 2)
        except Exception as ex:  # noqa: BLE001 — report, keep sweeping
            walls[name] = f"ERR {type(ex).__name__}"
            errors += 1
    for name, w in sorted(
        walls.items(), key=lambda kv: -(kv[1] if isinstance(kv[1], float) else 1e9)
    ):
        print(f"{name:35s} {w}")
    print(f"\n{len(walls)} queries, {errors} errors")
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
