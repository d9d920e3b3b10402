"""One-scale-step-up sweep of the RELATIONAL headline queries.

tools/scale_sweep.py answers "does the LLM family scale?"; this tool asks
the same question of the join/rollup/window surface: replicate the TPC-H-ish
tables N× with referential-integrity-preserving key shifts (every FK chain
stays intact within a replica; nation/region are fixed dims) and time each
headline query at sf0.1 and N·sf0.1. Ratios ≪ N mean the plan absorbs the
scale step (idle cores, AQE re-planning); ratios ≫ N flag a superlinear
term. Broadcast-threshold flips are part of what this measures: at 10×,
part (200k rows) may leave the broadcast regime — the plan should degrade
to a shuffle join, not fall over.

Usage:  python tools/relational_scale_sweep.py [scale_multiple] [trials]
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_SF = "/root/testdata/sf0.1"

# key columns shifted by replica*SHIFT so FK chains hold within a replica
SHIFT_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
}
COPY_TABLES = ["nation", "region", "documents", "embeddings"]
SHIFT = 100_000_000

QUERIES = [
    # The 12 bench-headline queries (bench.HEADLINE, r10 verdict #6) …
    "gl_enrichment",
    "seven_way_join",
    "top_products",
    "product_association",
    "retention_split",
    "rollup_date_user",
    "running_total_by_nation",
    "yoy_monthly_sales",
    "asof_last_before",
    "agg_ratio_per_part",
    "events_10min_window",
    "avg_daily_orders_sales",
    # … plus the window/rollup/decorrelation shapes that stress the
    # scale-sensitive machinery directly.
    "rollup_grouping_sets",
    "window_rownum_global",
    "correlated_scalar_max",
    # Round 7 event-side additions: user-keyed journeys and sketches.
    # The replica shift multiplies USERS (10x users, same events/user),
    # so these measure the per-user frontier joins and the bounded
    # register shuffles at 10x key cardinality.
    "funnel_view_click_purchase",
    "cohort_retention_daily",
    "hll_distinct_users",
    "cms_user_frequencies",
]


def build_scaled(spark, out_dir: str, n_replicas: int) -> None:
    from pyspark.sql import functions as F

    for t, keys in SHIFT_COLS.items():
        df = spark.read.parquet(f"{BASE_SF}/{t}.parquet")
        parts = []
        for r in range(n_replicas):
            if r == 0:
                parts.append(df)
            else:
                shifted = df
                for k in keys:
                    shifted = shifted.withColumn(
                        k, F.col(k) + F.lit(r * SHIFT)
                    )
                parts.append(shifted)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )
    for t in COPY_TABLES:
        spark.read.parquet(f"{BASE_SF}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{t}.parquet")


def main() -> int:
    n_replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from ssg_etl_spark.cache import release_tracked
    from ssg_etl_spark.plans.registry import load_all
    from ssg_etl_spark.session import get_spark

    spark = get_spark("relational_scale_sweep", shuffle_partitions=None)
    specs = load_all(include_extra=True)
    scaled_dir = tempfile.mkdtemp(prefix="sfrel_")
    try:
        t0 = time.time()
        build_scaled(spark, scaled_dir, n_replicas)
        print(f"# scaled tables ({n_replicas}x sf0.1) built in "
              f"{time.time() - t0:.1f}s at {scaled_dir}")

        def run(name: str, sf_dir: str) -> float:
            walls = []
            for _ in range(trials):
                t = time.time()
                specs[name].builder(spark, sf_dir).write.mode(
                    "overwrite"
                ).format("noop").save()
                walls.append(time.time() - t)
                release_tracked()
                spark.catalog.clearCache()
            return statistics.median(walls)

        small = {n: run(n, BASE_SF) for n in QUERIES}
        big = {n: run(n, scaled_dir) for n in QUERIES}

        print(f"\n{'query':28s} {'sf0.1':>8s} {'x' + str(n_replicas):>9s} "
              f"{'ratio':>6s}")
        worst = 0.0
        for name in QUERIES:
            s, b = small[name], big[name]
            ratio = b / s if s > 0 else float("inf")
            worst = max(worst, ratio)
            flag = "  <-- SUPERLINEAR" if ratio > 2.5 * n_replicas else ""
            print(f"{name:28s} {s:8.2f} {b:9.2f} {ratio:6.1f}{flag}")
        print(f"\nlinear-ish bound = {n_replicas}x data; worst ratio {worst:.1f}")
        import json

        out_path = os.path.join(REPO, "tools", "sf1_relational_r10.json")
        with open(out_path, "w") as f:
            json.dump(
                {
                    "n_replicas": n_replicas,
                    "trials": trials,
                    "small_s": {n: round(small[n], 2) for n in QUERIES},
                    "big_s": {n: round(big[n], 2) for n in QUERIES},
                    "ratio": {
                        n: round(big[n] / small[n], 2) if small[n] > 0 else None
                        for n in QUERIES
                    },
                    "worst_ratio": round(worst, 2),
                },
                f,
                indent=1,
            )
        print(f"wrote {out_path}")
        return 0
    finally:
        shutil.rmtree(scaled_dir, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
