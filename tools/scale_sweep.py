"""One-scale-step-up sweep of the LLM operator family (r4 verdict item 6).

sf0.1 is small enough to hide shuffle cliffs (bucket-occupancy blowups,
cluster-propagation round growth). This tool materializes a corpus N× the
size of sf0.1 (default 10× ≈ sf1.0: 50k documents / 100k embeddings) and
times each family operator at BOTH scales with identical parameters,
reporting the wall ratio — ~N means the operator scales linearly with the
corpus, >>N flags a superlinear term that would melt at 100 TB.

Scaled data (written under a temp dir, deleted on exit):
* documents — sf0.1 replicated N× with a per-replica suffix fused onto
  every word: WITHIN-replica near-dup structure (including the injected
  near-dups the fixtures carry) is preserved exactly, while cross-replica
  pairs share zero shingles — corpus size grows N× without manufacturing
  artificial corpus-wide duplicate clusters. doc_ids shift by r·10⁷
  (divisible by 10, so the delta/base % 10 split keeps its 1/10 fraction).
* embeddings — sf0.1 replicated N× with replica>0 vectors regenerated from
  xxhash64(vec_id, replica, dim) uniforms in [-1, 1): independent of the
  originals (no fake cosine-1.0 twins), same dimensionality and label
  distribution.

LSH parameters are occupancy-tuned PER SCALE and printed with each row:
sign-pattern buckets must keep per-bucket occupancy roughly constant
(bits ≈ log2(N / target_occupancy)), or the bucket self-join's
Σ occupancy² term — not the corpus scan — dominates. The registered
queries pin 8 tables × 3 bits for oracle replay at test SF; this sweep is
exactly the place where that pin must NOT be carried up a scale step.

Usage:  python tools/scale_sweep.py [scale_multiple] [trials]
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


def build_scaled(spark, out_dir: str, n_replicas: int) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{BASE_SF}/documents.parquet")
    doc_parts = []
    for r in range(n_replicas):
        if r == 0:
            doc_parts.append(docs)
        else:
            doc_parts.append(
                docs.select(
                    (F.col("doc_id") + F.lit(r * 10_000_000)).alias("doc_id"),
                    F.array_join(
                        F.transform(
                            F.split("text", " "),
                            lambda w: F.concat(w, F.lit(f"_r{r}")),
                        ),
                        " ",
                    ).alias("text"),
                    *[c for c in docs.columns if c not in ("doc_id", "text")],
                )
            )
    scaled_docs = doc_parts[0]
    for p in doc_parts[1:]:
        scaled_docs = scaled_docs.unionByName(p)
    scaled_docs.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )

    emb = spark.read.parquet(f"{BASE_SF}/embeddings.parquet")
    emb_parts = []
    for r in range(n_replicas):
        if r == 0:
            emb_parts.append(emb)
        else:
            emb_parts.append(
                emb.select(
                    (F.col("vec_id") + F.lit(r * 10_000_000)).alias("vec_id"),
                    "label",
                    F.transform(
                        "embedding",
                        lambda x, i: (
                            (
                                F.pmod(
                                    F.xxhash64(F.col("vec_id"), F.lit(r), i),
                                    F.lit(2000),
                                )
                                - 1000
                            )
                            / 1000.0
                        ).cast("float"),
                    ).alias("embedding"),
                )
            )
    scaled_emb = emb_parts[0]
    for p in emb_parts[1:]:
        scaled_emb = scaled_emb.unionByName(p)
    scaled_emb.repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )


def family(sf_dir: str, n_vectors: int):
    """(name, thunk, params-note) per operator; LSH bits occupancy-tuned to
    the corpus size so per-bucket occupancy stays ~constant across scales."""
    import math

    from pyspark.sql import functions as F

    from ssg_etl_spark.operators import (
        analytics,
        bloom,
        clustering,
        dedup,
        multimodal,
        sampling,
        similarity,
        sketches,
        text,
        zorder,
    )
    from ssg_etl_spark.sources.tables import load_table

    # Keep expected sign-bucket occupancy near ~150 vectors: bits =
    # log2(N/150) (uniform-bucket approximation; real buckets skew, which
    # is fine — the point is scaling bits WITH the corpus).
    bits = max(3, int(math.ceil(math.log2(max(2, n_vectors / 150)))))
    n_tables = 8

    # SimHash banding tuned the same way: band width grows with the
    # corpus so per-(band, chunk) occupancy stays ~150 (2^band_bits
    # values per band), trading guaranteed Hamming radius (< n_bands)
    # for corpus coverage — the documented scale lever of banded
    # SimHash. docs:embeddings is 5:2 in the fixtures.
    n_docs = n_vectors * 5 // 2
    sim_band_bits = max(6, int(math.ceil(math.log2(max(2, n_docs / 150)))))
    sim_bands = max(2, 60 // sim_band_bits)
    sim_hamming = min(7, sim_bands - 1)

    def docs(spark):
        return load_table(spark, sf_dir, "documents")

    def emb(spark):
        return load_table(spark, sf_dir, "embeddings")

    def queries(spark):
        e = emb(spark)
        return e.filter(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )

    return [
        ("dedup_exact", lambda s: dedup.exact_dedup_groups(docs(s)), ""),
        ("chunk_dedup_stats", lambda s: dedup.chunk_dedup_stats(docs(s)), ""),
        (
            "span_deduped_corpus",
            lambda s: dedup.span_deduped_corpus(docs(s)),
            "",
        ),
        (
            "span_dedup_incremental",
            lambda s: dedup.chunk_keep_list_vs_index(
                docs(s).filter("doc_id % 10 = 0"),
                dedup.build_chunk_index(docs(s).filter("doc_id % 10 != 0")),
            ),
            "index built in-run",
        ),
        ("dedup_minhash_lsh", lambda s: dedup.minhash_lsh_pairs(docs(s), 0.5), ""),
        (
            "dedup_simhash",
            lambda s: dedup.simhash_pairs(
                docs(s), n_bands=sim_bands, max_hamming=sim_hamming
            ),
            f"bands={sim_bands} hd<={sim_hamming}",
        ),
        (
            "dedup_clusters",
            lambda s: dedup.duplicate_clusters(
                dedup.minhash_lsh_pairs(docs(s), 0.5).select("doc_a", "doc_b")
            ),
            "pairs via minhash",
        ),
        (
            "dedup_incremental_vs_corpus",
            lambda s: dedup.minhash_lsh_pairs_incremental(
                docs(s).filter("doc_id % 10 != 0"),
                docs(s).filter("doc_id % 10 = 0"),
                0.5,
            ),
            "",
        ),
        (
            "embedding_near_dup_lsh",
            lambda s: similarity.lsh_near_dup_pairs(
                emb(s), 0.45, n_tables=n_tables, bits_per_table=bits
            ),
            f"L={n_tables} b={bits}",
        ),
        (
            "knn_label_agreement_lsh",
            lambda s: similarity.knn_label_agreement_lsh(
                emb(s), k=5, n_tables=n_tables, bits_per_table=bits
            ),
            f"L={n_tables} b={bits}",
        ),
        (
            "ann_lsh_topk",
            lambda s: similarity.lsh_bucketed_topk(
                emb(s), queries(s), k=10, n_tables=n_tables, bits_per_table=bits
            ),
            f"L={n_tables} b={bits}",
        ),
        (
            "dedup_incremental_exact",
            lambda s: dedup.incremental_exact_dedup(
                dedup.exact_dedup_groups(docs(s).filter("doc_id % 10 != 0")),
                docs(s).filter("doc_id % 10 = 0"),
            ),
            "index built in-run",
        ),
        ("unigram_logprob", lambda s: text.unigram_logprob(docs(s)), ""),
        (
            "quality_model_score",
            lambda s: text.quality_model_score(docs(s)),
            "",
        ),
        (
            "token_budget_selection",
            lambda s: sampling.token_budget_selection(
                text.text_metrics(docs(s)).select(
                    "doc_id",
                    "quality_score",
                    F.col("n_words").alias("n_tokens"),
                ),
                10_000,
            ),
            "",
        ),
        (
            "weighted_sample",
            lambda s: sampling.weighted_sample(
                docs(s), k=500, weight_col="n_chars"
            ),
            "",
        ),
        (
            "temperature_mixture",
            lambda s: sampling.temperature_mixture(
                docs(s), alpha=0.5, group_col="lang"
            ),
            "",
        ),
        (
            "zorder_key",
            lambda s: zorder.zorder_key(docs(s), ["n_chars", "doc_id"]).select(
                "doc_id", "zorder"
            ),
            "",
        ),
        (
            "ann_ivf_topk",
            lambda s: similarity.ivf_topk(
                emb(s),
                queries(s),
                k=10,
                n_cells=max(16, int(round(math.sqrt(n_vectors)))),
                n_probe=4,
                train_mod=max(1, n_vectors // 10_000),
            ),
            f"cells≈sqrt(N) train_mod={max(1, n_vectors // 10_000)}",
        ),
        # k-means: per iteration one scan + one k-row shuffle; the wall
        # should track the scan (~linear), parameters fixed across scales.
        (
            "kmeans_assign",
            lambda s: clustering.kmeans_assign(emb(s), k=4, n_iter=3),
            "k=4 iters=3",
        ),
        # Sketches: linear scan, bounded (non-growing) shuffle state.
        (
            "hll_distinct_docs",
            lambda s: sketches.approx_distinct(docs(s), ["lang"], "text"),
            "",
        ),
        (
            "cms_lang_freq",
            lambda s: sketches.cms_lookup(
                sketches.cms_sketch(docs(s), [], "lang"),
                docs(s).select("lang").distinct(),
                "lang",
            ),
            "",
        ),
        # Text featurization + LM scoring: explode-heavy but join-bounded
        # (term/bigram dimension tables), expected ~linear.
        (
            "hashed_tf",
            lambda s: text.hashed_tf(docs(s)),
            "",
        ),
        (
            "bigram_logprob",
            lambda s: text.bigram_logprob(docs(s)),
            "",
        ),
        (
            "lm_quality_cut",
            lambda s: text.lm_quality_cut(docs(s), 0.2),
            "",
        ),
        # Round 8: membership sketch (constant-size state, broadcast
        # probe — build cost should track |keys| linearly, probe below
        # it), grouped quantile sketch, prefix-filtered exact Jaccard.
        (
            "bloom_build_probe",
            lambda s: bloom.bloom_probe(
                bloom.bloom_build(docs(s).select("doc_id"), "doc_id"),
                docs(s).select("doc_id"),
                "doc_id",
            ),
            "n_bits=1024 k=4",
        ),
        (
            "quantiles_grouped",
            lambda s: analytics.histogram_quantiles_grouped(
                docs(s), "n_chars", ["lang"]
            ),
            "20 bins x |langs| groups",
        ),
        (
            "dedup_jaccard_prefix",
            lambda s: dedup.ngram_jaccard_pairs_prefix(docs(s), 0.5),
            "exact full-universe semantics",
        ),
        # Round 10: mergeable log-bucket quantile sketch (single scan +
        # bounded bucket table — expected ~linear in the scan) and
        # SemDeDup, whose scale lever is k: expected cluster size is held
        # near ~150 vectors (k = N/150, the same occupancy discipline as
        # the LSH bits above), so the intra-cluster pair stage stays
        # ~linear in N instead of quadratic.
        (
            "logbucket_quantiles",
            lambda s: sketches.logbucket_quantiles(
                sketches.logbucket_sketch(docs(s), "n_chars", ["lang"]),
                (0.25, 0.5, 0.9, 0.99),
                ["lang"],
            ),
            "sig=3 x |langs| groups",
        ),
        (
            "semdedup",
            # Expected cluster size held near ~500 vectors (the model —
            # k x dim literal doubles — rides the plan, so k also bounds
            # expression size; 500 keeps it executor-friendly while still
            # scaling k 10x across the decade).
            lambda s: dedup.semdedup_flags(
                emb(s), k=max(4, n_vectors // 500), n_iter=2, tau=0.3
            ),
            f"k={max(4, n_vectors // 500)} (occupancy-scaled) iters=2",
        ),
        # Bottom-k over near-unique document text: the global form's
        # TakeOrdered fast path should be scan-bound (~linear); the
        # grouped form's distinct-pair shuffle grows with distinct keys
        # (also ~linear here since text is near-unique).
        (
            "bottomk_global",
            lambda s: sketches.bottomk_sketch(docs(s), "text", k=256),
            "TakeOrdered fast path",
        ),
        (
            "bottomk_grouped",
            lambda s: sketches.bottomk_sketch_grouped(
                docs(s), "text", ["lang"], k=256
            ),
            "k=256 x |langs|, distinct-pair shuffle",
        ),
        # Round 11: the last unmeasured r10 additions. Weighted logbucket
        # adds only a per-row FLOOR+SUM to the unweighted sketch —
        # expected scan-bound like logbucket_quantiles. The KMV rollup is
        # the full registry shape (per-group daily sketches → min-union
        # fold → estimate): the daily grouped build is the distinct-pair
        # shuffle; the fold inputs are ≤ k rows per day. Grouped exact
        # quantiles at HIGH cardinality (~1000 groups vs |langs|≈5)
        # stress the broadcast range table and the per-group collect
        # bounds — the r10 pin only covered low cardinality.
        (
            "logbucket_weighted",
            lambda s: sketches.logbucket_quantiles(
                sketches.logbucket_sketch(
                    docs(s), "n_chars", ["lang"], weight_col="n_chars"
                ),
                (0.25, 0.5, 0.9, 0.99),
                ["lang"],
            ),
            "weight=n_chars (token-mass percentiles)",
        ),
        (
            "kmv_daily_rollup",
            lambda s: sketches.kmv_distinct_estimate(
                sketches.bottomk_merge(
                    [
                        sketches.bottomk_sketch_grouped(
                            docs(s).withColumn(
                                "_day", F.col("doc_id") % 30
                            ),
                            "text",
                            ["_day"],
                            k=256,
                        ).select("h", "text")
                    ],
                    k=256,
                ),
                k=256,
            ),
            "30 daily sketches -> min-union -> estimate",
        ),
        (
            "quantiles_exact_grouped_hi",
            lambda s: analytics.quantiles_exact_grouped(
                docs(s).withColumn("_g", F.col("doc_id") % 1000),
                "n_chars",
                ["_g"],
                (0.5, 0.9),
            ),
            "~1000 groups x 2 qs, member-range zoom",
        ),
        # Round 12: the real-codec media paths (r11 verdict #4/#5) and
        # the overlap matrix at realistic source counts (#7). The codec
        # work is pure per-asset CPU inside Arrow-batched mapInPandas —
        # expected ~linear in asset count with zero shuffle growth; the
        # decade pin is what verifies that shape instead of assuming it.
        (
            "media_png",
            lambda s: multimodal.png_roundtrip(
                multimodal.png_assets_from_documents(docs(s))
            ),
            "encode+decode per doc, stdlib DEFLATE",
        ),
        (
            "media_jpeg",
            lambda s: multimodal.jpeg_roundtrip(
                multimodal.jpeg_assets_from_documents(docs(s))
            ),
            "encode+decode per doc, Huffman+IDCT",
        ),
        # Round 13: the cross-codec composition (r12 verdict #8 — its
        # parts media_png/media_jpeg are pinned above, the composed
        # JPEG-decode -> resample -> PNG-encode -> PNG-decode chain was
        # not). Same per-asset Arrow-batched shape; the pin verifies
        # composing codecs stays ~linear instead of assuming it.
        (
            "media_transcode",
            lambda s: multimodal.png_roundtrip(
                multimodal.transcode_resize_images(
                    multimodal.jpeg_assets_from_documents(docs(s)), 8, 8
                )
            ),
            "JPEG decode -> 8x8 resample -> PNG encode+decode per doc",
        ),
        # Round 13 (cont.): the cross-modality triage manifest — three
        # header scans (image/audio/video) unioned, zero decodes. Header
        # cost is independent of media size, so the pin should read as
        # near-pure scan/synthesis linearity.
        (
            "media_triage",
            lambda s: __import__(
                "ssg_etl_spark.plans.llm_pack", fromlist=["llm_pack"]
            ).triage_manifest_over(docs(s)),
            "jpeg+mp3+mp4 header scans unioned, keep predicates",
        ),
        # |S|=100 sources -> C(100,2)=4950 pairs x k=256 sketch rows ≈
        # 1.3M tagged rows; the pin verifies the guarded |S|^2·k pair
        # expansion stays sketch-bounded (flat-ish across the corpus
        # decade: the sketch table is k rows/source regardless of N).
        (
            "kmv_overlap_matrix_100",
            lambda s: sketches.kmv_overlap_matrix(
                sketches.bottomk_sketch_grouped(
                    docs(s).withColumn(
                        "_src", (F.col("doc_id") % 100).cast("string")
                    ),
                    "text",
                    ["_src"],
                    k=256,
                ),
                "_src",
                k=256,
            ),
            "|S|=100, 4950 pairs x k=256",
        ),
    ]


def main() -> int:
    argv = list(sys.argv[1:])
    only: set[str] | None = None
    for flag in [a for a in argv if a.startswith("--only=")]:
        argv.remove(flag)
        picked = set(flag.split("=", 1)[1].split(","))
        only = picked if only is None else only | picked
    n_replicas = int(argv[0]) if len(argv) > 0 else 10
    trials = int(argv[1]) if len(argv) > 1 else 2

    from ssg_etl_spark.cache import release_tracked
    from ssg_etl_spark.session import get_spark

    spark = get_spark("scale_sweep", shuffle_partitions=None)
    scaled_dir = tempfile.mkdtemp(prefix="sfscale_")
    try:
        t0 = time.time()
        build_scaled(spark, scaled_dir, n_replicas)
        print(f"# scaled corpus ({n_replicas}x sf0.1) built in "
              f"{time.time() - t0:.1f}s at {scaled_dir}")

        def run(thunk) -> float:
            walls = []
            for _ in range(trials):
                t = time.time()
                thunk(spark).write.mode("overwrite").format("noop").save()
                walls.append(time.time() - t)
                release_tracked()
                spark.catalog.clearCache()
            return statistics.median(walls)

        n_small = spark.read.parquet(f"{BASE_SF}/embeddings.parquet").count()
        n_big = n_small * n_replicas

        def pick(fam):
            if only is None:
                return fam
            unknown = only - {n for n, _, _ in fam}
            if unknown:
                raise SystemExit(f"unknown --only op(s): {sorted(unknown)}")
            return [(n, f, note) for n, f, note in fam if n in only]

        small = {
            n: (run(f), note) for n, f, note in pick(family(BASE_SF, n_small))
        }
        big = {
            n: (run(f), note)
            for n, f, note in pick(family(scaled_dir, n_big))
        }

        print(f"\n{'operator':32s} {'sf0.1':>8s} {'x' + str(n_replicas):>9s} "
              f"{'ratio':>6s}  params@big")
        worst = 0.0
        for name in small:
            s, _ = small[name]
            b, note = big[name]
            ratio = b / s if s > 0 else float('inf')
            worst = max(worst, ratio)
            flag = "  <-- SUPERLINEAR" if ratio > 2.5 * n_replicas else ""
            print(f"{name:32s} {s:8.2f} {b:9.2f} {ratio:6.1f}  {note}{flag}")
        print(f"\nlinear-ish bound = {n_replicas}x data; "
              f"worst ratio {worst:.1f}")
        return 0
    finally:
        shutil.rmtree(scaled_dir, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
