"""Capstone scale run (r5 verdict item 8): the composed training_manifest
deliverable — not just its component operators — executed end-to-end at a
10×-sf0.1 corpus (≈ sf1.0: 50k documents), with per-stage walls.

Reuses tools/scale_sweep.build_scaled (replica-suffixed documents: within-
replica near-dup structure preserved, no artificial cross-replica dups).
Stages timed separately so a cliff is attributable:

* dedup_exact        — digest groupBy (manifest CTE 1)
* dedup_ngram_jaccard— the near-dup pair graph (manifest's expensive CTE)
* dedup_clusters     — connected components over the pairs
* training_manifest  — the full composed deliverable (keep list × quality
                       threshold × reproducible split)

Usage:  python tools/sf1_manifest_run.py [n_replicas] [trials]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def main() -> int:
    n_replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from scale_sweep import build_scaled

    from ssg_etl_spark.cache import release_tracked
    from ssg_etl_spark.plans.registry import load_all
    from ssg_etl_spark.session import get_spark

    spark = get_spark("sf1-manifest", master="local[32]", shuffle_partitions=64)
    specs = load_all(include_extra=True)

    out_dir = tempfile.mkdtemp(prefix="sf1_manifest_")
    try:
        t0 = time.time()
        build_scaled(spark, out_dir, n_replicas)
        build_wall = round(time.time() - t0, 2)
        n_docs = spark.read.parquet(f"{out_dir}/documents.parquet").count()

        stages = [
            "dedup_exact",
            "dedup_ngram_jaccard",
            "dedup_clusters",
            "training_manifest",
            # Round 8 (r7 verdict #5): the LSH family's sf1.0 decade pin —
            # banded minhash over the full corpus and the delta×base
            # incremental path, with measured shuffle bytes.
            "dedup_minhash_lsh",
            "dedup_incremental_vs_corpus",
        ]
        from shuffle_audit import audit_query

        result = {
            "n_replicas": n_replicas,
            "n_docs": n_docs,
            "corpus_build_sec": build_wall,
            "stages": {},
        }
        for name in stages:
            walls = []
            for _ in range(trials):
                t0 = time.time()
                specs[name].builder(spark, out_dir).write.mode(
                    "overwrite"
                ).format("noop").save()
                walls.append(round(time.time() - t0, 2))
                release_tracked()
            # One measured pass for shuffle economics (status REST API) —
            # shuffle-per-input-byte is the scale-invariant ratio the
            # COVERAGE growth table tracks across sf decades.
            audit = audit_query(spark, specs[name].builder, out_dir)
            result["stages"][name] = {
                "trials": walls,
                "median": round(statistics.median(walls), 2),
                "input_mb": audit["input_mb"],
                "shuf_w_mb": audit["shuf_w_mb"],
                "spill_mb": audit["spill_mb"],
                "ratio": audit["ratio"],
            }
        rows = specs["training_manifest"].builder(spark, out_dir).count()
        result["manifest_rows"] = rows
        release_tracked()
        print(json.dumps(result))
        return 0
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
