"""sf1.0 decade pin for the EMBEDDING/ANN family (r9 verdict #4; the r8
round did the text-dedup family in tools/sf1_manifest_run.py).

Builds the 10×-sf0.1 corpus (≈ sf1.0: 50k documents / 20k embedding
vectors via tools/scale_sweep.build_scaled — replica-suffixed text,
hash-fresh replica vectors so no artificial cross-replica duplicates),
then:

* times the family's registry queries with per-query shuffle economics
  (tools/shuffle_audit: input bytes, shuffle-write bytes, spill —
  shuffle-per-input-byte is the scale-invariant predictor the COVERAGE
  decade tables track): ``embedding_near_dup``, ``semantic_keep_list``,
  ``ann_lsh_topk``, ``ann_ivf_probe``, ``kmeans_embeddings``;
* measures recall@10 of the operational LSH/IVF/int8 paths against the
  brute-force cosine top-k at this scale — recall is MEASURED at the
  decade, not extrapolated, because the LSH occupancy economics (bits
  auto-scaled to corpus size) are exactly what a 10× corpus stresses.

Recall methodology: queries come from the BASE replica only. The scaled
replicas are hash-uniform noise — high-dimensional near-orthogonal
distractor mass (the tool reports the queries' median 10th-neighbor
cosine so the structure is visible) — while the base replica keeps the
fixture's real cluster structure, so base-replica queries have
meaningful true neighbors and the 10× noise plays the role real scale
plays: more ballast the index must NOT confuse for neighbors. LSH runs
the recall-stable operational config (``n_tables=None`` →
``auto_tables_for_recall`` inverts the OR-construction formula at the
auto-scaled bits — the r8 fix for geometric recall loss; a fixed-L
point is also reported to show the loss the auto config prevents). IVF
is reported at occupancy-scaled cells across probe counts.

Usage:  python tools/sf1_embedding_run.py [n_replicas] [trials] [k]
Prints one JSON line; record the table in COVERAGE.md.
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

STAGES = [
    "embedding_near_dup",
    "semantic_keep_list",
    "ann_lsh_topk",
    "ann_lsh_topk_auto",
    "ann_ivf_probe",
    "kmeans_embeddings",
]


def main() -> int:
    n_replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from ann_recall import recall, topk_sets
    from scale_sweep import build_scaled
    from shuffle_audit import audit_query

    from pyspark.sql import functions as F

    from ssg_etl_spark.cache import release_tracked
    from ssg_etl_spark.operators import similarity
    from ssg_etl_spark.plans.registry import load_all
    from ssg_etl_spark.session import get_spark
    from ssg_etl_spark.sources.tables import load_table

    spark = get_spark("sf1-embedding", master="local[32]", shuffle_partitions=64)
    specs = load_all(include_extra=True)

    out_dir = tempfile.mkdtemp(prefix="sf1_embedding_")
    try:
        t0 = time.time()
        build_scaled(spark, out_dir, n_replicas)
        build_wall = round(time.time() - t0, 2)
        n_vec = spark.read.parquet(f"{out_dir}/embeddings.parquet").count()
        n_docs = spark.read.parquet(f"{out_dir}/documents.parquet").count()

        result = {
            "n_replicas": n_replicas,
            "n_docs": n_docs,
            "n_vectors": n_vec,
            "corpus_build_sec": build_wall,
            "stages": {},
        }
        for name in STAGES:
            walls = []
            for _ in range(trials):
                t0 = time.time()
                specs[name].builder(spark, out_dir).write.mode(
                    "overwrite"
                ).format("noop").save()
                walls.append(round(time.time() - t0, 2))
                release_tracked()
            audit = audit_query(spark, specs[name].builder, out_dir)
            result["stages"][name] = {
                "trials": walls,
                "median": round(statistics.median(walls), 2),
                "input_mb": audit["input_mb"],
                "shuf_w_mb": audit["shuf_w_mb"],
                "spill_mb": audit["spill_mb"],
                "ratio": audit["ratio"],
            }

        # Recall@k at the decade: structured base-replica queries (replica
        # vec_ids are offset by 10M; base keeps the fixture's clusters),
        # 10× noise replicas as distractor ballast.
        emb = load_table(spark, out_dir, "embeddings")
        queries = emb.filter(
            (F.col("vec_id") < 10_000_000) & (F.col("vec_id") % 10 == 0)
        ).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        n_queries = queries.count()

        def run(thunk):
            t0 = time.time()
            sets = topk_sets(thunk(), k)
            wall = round(time.time() - t0, 2)
            release_tracked()
            return sets, wall

        t0 = time.time()
        exact_df = similarity.brute_force_topk(emb, queries, k)
        # Median kth-neighbor cosine: shows the queries have real
        # neighbors (structured base) vs the noise floor.
        kth = (
            exact_df.groupBy("query_id")
            .agg(F.min("cosine_sim").alias("kth_cos"))
            .agg(F.expr("percentile(kth_cos, 0.5)").alias("med"))
            .first()["med"]
        )
        exact = topk_sets(exact_df, k)
        # Strong-neighbor recall set: true top-k pairs at cosine >= 0.5.
        # The fixture's embedding space is SMOOTH (measured: best pair
        # 0.55, top-1 median 0.47, no pairs at the formula's 0.7 design
        # point), so recall@10 over all kth neighbors is dominated by
        # ~0.42-cosine pairs no sub-brute-force method promises anything
        # about; the >=0.5 tail is the strongest structure that exists
        # and the better proxy for the near-dup regime the family
        # actually serves. Report both.
        exact_high = topk_sets(
            exact_df.filter(F.col("cosine_sim") >= 0.5), k
        )
        exact_wall = round(time.time() - t0, 2)
        release_tracked()
        recall_report = {"brute": {"recall_at_k": 1.0, "wall_s": exact_wall}}
        n_cells = max(16, n_vec // 125)  # occupancy-scaled (sf0.1: 16)
        for name, thunk in [
            # Recall-stable operational config: auto bits AND auto tables.
            (
                "lsh_auto_tables",
                lambda: similarity.lsh_bucketed_topk(
                    emb, queries, k, n_tables=None
                ),
            ),
            # The fixed-L point the auto config exists to beat (r8 lesson:
            # fixed L loses recall geometrically as auto-bits grow).
            (
                "lsh_fixed_8",
                lambda: similarity.lsh_bucketed_topk(
                    emb, queries, k, n_tables=8
                ),
            ),
            (
                "ivf_probe_4",
                lambda: similarity.ivf_topk(
                    emb, queries, k, n_cells=n_cells, n_probe=4
                ),
            ),
            (
                "ivf_probe_12",
                lambda: similarity.ivf_topk(
                    emb, queries, k, n_cells=n_cells, n_probe=12
                ),
            ),
            (
                "quantized_int8",
                lambda: similarity.brute_force_topk(
                    similarity.dequantize(similarity.quantize_int8(emb)),
                    queries,
                    k,
                ),
            ),
        ]:
            sets, wall = run(thunk)
            recall_report[name] = {
                "recall_at_k": recall(exact, sets),
                "recall_at_k_cos05": (
                    recall(exact_high, sets)
                    if any(s for s in exact_high.values())
                    else None
                ),
                "wall_s": wall,
            }
        result["recall"] = {
            "k": k,
            "n_queries": n_queries,
            "median_kth_neighbor_cosine": round(float(kth), 4),
            "n_queries_with_cos05_neighbors": len(
                [q for q, s in exact_high.items() if s]
            ),
            "ivf_n_cells": n_cells,
            "paths": recall_report,
        }
        print(json.dumps(result))
        return 0
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
