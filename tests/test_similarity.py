"""Similarity search: brute-force exactness (vs numpy) and LSH recall."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ssg_etl_spark.operators import similarity
from ssg_etl_spark.sources.tables import load_table


def _queries(emb):
    return emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_brute_force_matches_numpy(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    out = similarity.brute_force_topk(emb, _queries(emb), k=5).collect()
    by_query: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r.query_id, r.rank)):
        by_query.setdefault(r.query_id, []).append(r.vec_id)
    for qid, got in by_query.items():
        q = vecs[qid]
        sims = {
            vid: float(np.dot(q, v) / (np.linalg.norm(q) * np.linalg.norm(v)))
            for vid, v in vecs.items()
            if vid != qid
        }
        want = [vid for vid, _ in sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:5]]
        assert got == want, qid


def test_lsh_recall_vs_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r.query_id, r.vec_id)
        for r in similarity.brute_force_topk(emb, _queries(emb), k=10).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in similarity.lsh_bucketed_topk(emb, _queries(emb), k=10).collect()
    }
    # Approximate path: no junk (every hit is a real vector pair), and some
    # overlap with the exact answer set.
    assert approx, "LSH produced nothing"
    assert len(approx & exact) / len(exact) > 0.2


def test_lsh_auto_tables_recall_at_design_point(spark, sf_dir):
    """The recall-stable auto config (n_tables=None picks L from the
    (L, b) formula at the auto-scaled b): for PLANTED near-dup pairs —
    cosine ≥ 0.9, the operational curation target, far above the 0.7
    design cosine — the twin must appear in the query's LSH top-k for
    ≥ 90% of pairs. Uniform-noise top-10 recall is NOT the contract
    (those neighbors sit at cosine ~0.3, below the design point)."""
    import math
    import random

    rng = random.Random(8)
    dim = 16
    base: list[tuple[int, list[float]]] = []
    for i in range(400):
        v = [rng.uniform(-1, 1) for _ in range(dim)]
        base.append((i, v))
    # 40 planted twins at high cosine: copy + small perturbation.
    twins = []
    for i in range(40):
        vid, v = base[i]
        noisy = [x + rng.uniform(-0.05, 0.05) for x in v]
        twins.append((10_000 + vid, noisy))
    rows = [(vid, [float(x) for x in v], 0) for vid, v in base + twins]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / math.sqrt(sum(x * x for x in a) * sum(y * y for y in b))

    want = {
        (vid, vid - 10_000)
        for vid, v in twins
        if cos(v, dict(base)[vid - 10_000]) >= 0.9
    }
    assert len(want) >= 30  # small perturbation keeps most twins >= 0.9

    queries = emb.filter("vec_id >= 10000").selectExpr(
        "vec_id as query_id", "embedding as query_vec"
    )
    got = {
        (r.query_id, r.vec_id)
        for r in similarity.lsh_bucketed_topk(
            emb, queries, k=10, n_tables=None
        ).collect()
    }
    found = sum(1 for pair in want if pair in got)
    assert found / len(want) >= 0.9, (found, len(want))


def test_auto_tables_for_recall_grows_with_bits():
    from ssg_etl_spark.operators.similarity import auto_tables_for_recall

    ls = [auto_tables_for_recall(b) for b in (3, 4, 6, 8)]
    assert ls == sorted(ls), ls
    assert ls[-1] > ls[0]
    # Tighter recall or farther design point → more tables.
    assert auto_tables_for_recall(4, target_recall=0.99) > auto_tables_for_recall(4)
    assert auto_tables_for_recall(4, at_cosine=0.5) > auto_tables_for_recall(4, at_cosine=0.9)

    import pytest as _p

    with _p.raises(ValueError):
        auto_tables_for_recall(0)
    with _p.raises(ValueError):
        auto_tables_for_recall(4, target_recall=1.0)


def test_ivf_recall_vs_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r.query_id, r.vec_id)
        for r in similarity.brute_force_topk(emb, _queries(emb), k=10).collect()
    }
    approx = similarity.ivf_topk(
        emb, _queries(emb), k=10, n_cells=8, n_probe=4, train_iters=2
    ).collect()
    got = {(r.query_id, r.vec_id) for r in approx}
    assert got, "IVF produced nothing"
    # Probing half the cells should recover a meaningful share of the
    # exact top-10; exact values on the hits (cosine computed on originals).
    assert len(got & exact) / len(exact) > 0.3
    # Probing ALL cells makes IVF exact: candidate set == corpus.
    full = {
        (r.query_id, r.vec_id)
        for r in similarity.ivf_topk(
            emb, _queries(emb), k=10, n_cells=8, n_probe=8, train_iters=1
        ).collect()
    }
    assert full == exact


def test_lsh_near_dup_pairs_subset_of_exact(spark, sf_dir):
    """LSH-bucketed near-dup pairs: every emitted pair is exactly verified
    (subset of the O(N²) baseline, identical similarities) and recall on
    the fixture's planted near-dups stays high."""
    from ssg_etl_spark.operators.similarity import (
        embedding_near_dup_pairs,
        lsh_near_dup_pairs,
    )
    from ssg_etl_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r.vec_a, r.vec_b): r.cosine_sim
        for r in embedding_near_dup_pairs(emb, 0.45).collect()
    }
    approx = {
        (r.vec_a, r.vec_b): r.cosine_sim
        for r in lsh_near_dup_pairs(emb, 0.45).collect()
    }
    assert set(approx) <= set(exact), "verification must kill false positives"
    for k, v in approx.items():
        assert abs(v - exact[k]) < 1e-12  # same exact cosine, not an estimate
    if exact:
        assert len(approx) / len(exact) >= 0.7  # OR-construction recall


def test_knn_label_agreement_lsh_vs_exact(spark, sf_dir):
    """Candidate-fed noisy-label detection (r4 verdict item 2): the LSH
    variant shares the vote stage with the all-pairs form, so on the
    fixture it must (a) cover ~every vector (buckets are not singleton at
    corpus sizes), (b) agree with the exact majority label for most
    vectors (recall-style bound — LSH may rank farther bucket-mates into
    the top-k, shifting some votes), and (c) emit valid vote counts."""
    emb = load_table(spark, sf_dir, "embeddings")
    exact = {
        r.vec_id: r for r in similarity.knn_label_agreement(emb, k=5).collect()
    }
    approx = {
        r.vec_id: r
        for r in similarity.knn_label_agreement_lsh(emb, k=5).collect()
    }
    assert len(approx) >= 0.95 * len(exact), "LSH candidate coverage collapsed"
    common = set(exact) & set(approx)
    same_majority = sum(
        1 for v in common
        if exact[v].majority_label == approx[v].majority_label
    )
    assert same_majority / len(common) >= 0.6
    for r in approx.values():
        assert 0 <= r.n_agree <= 5
        assert 0.0 <= r.agree_ratio <= 1.0


def test_quantize_int8_roundtrip_and_cosine_fidelity(spark, sf_dir):
    """|x̂ − x| ≤ scale/2 element-wise, and cosine between dequantized
    vectors tracks float cosine to <1e-2 on the fixture distribution."""
    from pyspark.sql import functions as F

    from ssg_etl_spark.operators.similarity import (
        cosine,
        dequantize,
        quantize_int8,
    )
    from ssg_etl_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    q = quantize_int8(emb)
    back = dequantize(q)
    j = (
        emb.select("vec_id", F.col("embedding").alias("orig"))
        .join(back.withColumnRenamed("embedding", "deq"), "vec_id")
        .join(q.select("vec_id", "scale"), "vec_id")
    )
    err = j.select(
        F.aggregate(
            F.zip_with(
                F.transform("orig", lambda x: x.cast("double")),
                F.col("deq"),
                lambda a, b: F.abs(a - b),
            ),
            F.lit(0.0),
            lambda acc, x: F.greatest(acc, x),
        ).alias("max_err"),
        (F.col("scale") / 2 + 1e-12).alias("bound"),
    )
    assert err.filter(F.col("max_err") > F.col("bound")).count() == 0

    # cosine fidelity on consecutive-id pairs
    a = j.select(F.col("vec_id").alias("ida"), F.col("orig").alias("va"),
                 F.col("deq").alias("da"))
    b = j.select((F.col("vec_id") + 1).alias("ida"),
                 F.col("orig").alias("vb"), F.col("deq").alias("db"))
    pairs = a.join(b, "ida").select(
        (cosine(F.col("va"), F.col("vb"))
         - cosine(F.col("da"), F.col("db"))).alias("dc")
    )
    row = pairs.agg(F.max(F.abs(F.col("dc"))).alias("m")).collect()[0]
    assert row.m < 1e-2, row.m


def test_quantized_topk_recall_vs_float(spark, sf_dir):
    """Top-10 over the int8-dequantized corpus must recover ≥90% of the
    float-corpus top-10 per query on the fixture."""
    from pyspark.sql import functions as F

    from ssg_etl_spark.operators.similarity import (
        brute_force_topk,
        dequantize,
        quantize_int8,
    )
    from ssg_etl_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = brute_force_topk(emb, queries, k=10).collect()
    quant = brute_force_topk(
        dequantize(quantize_int8(emb)), queries, k=10
    ).collect()
    ex, qt = {}, {}
    for r in exact:
        ex.setdefault(r.query_id, set()).add(r.vec_id)
    for r in quant:
        qt.setdefault(r.query_id, set()).add(r.vec_id)
    assert set(ex) == set(qt)
    recalls = [len(ex[q] & qt[q]) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) >= 0.9, sorted(recalls)[:5]


def test_embedding_near_dup_incremental_mixed_only(spark, sf_dir):
    """Delta-vs-base semantic near-dup: only mixed pairs, all exactly
    verified (subset of the O(N²) baseline restricted to mixed pairs),
    with decent recall on the fixture."""
    from ssg_etl_spark.operators.similarity import (
        embedding_near_dup_pairs,
        lsh_near_dup_pairs_incremental,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 10 != 0)
    delta = emb.filter(F.col("vec_id") % 10 == 0)
    got = {
        (r.vec_new, r.vec_base): r.cosine_sim
        for r in lsh_near_dup_pairs_incremental(base, delta, 0.45).collect()
    }
    exact_mixed = {}
    for r in embedding_near_dup_pairs(emb, 0.45).collect():
        a_d, b_d = r.vec_a % 10 == 0, r.vec_b % 10 == 0
        if a_d != b_d:  # one side delta, one side base
            new, old = (r.vec_a, r.vec_b) if a_d else (r.vec_b, r.vec_a)
            exact_mixed[(new, old)] = r.cosine_sim
    assert set(got) <= set(exact_mixed), "false positives must be impossible"
    for k, v in got.items():
        assert abs(v - exact_mixed[k]) < 1e-12
    assert all(n % 10 == 0 and b % 10 != 0 for n, b in got)
    if exact_mixed:
        assert len(got) / len(exact_mixed) >= 0.5


def test_quantize_int8_shrinks_cached_storage(spark, sf_dir):
    """The 4x-storage claim, measured: caching the int8 codes takes well
    under half the memory of caching the float embeddings (int8 array +
    scale vs float array; Spark row overhead keeps the ratio under the
    theoretical 4x)."""
    from ssg_etl_spark.cache import release_tracked
    from ssg_etl_spark.operators.similarity import quantize_int8

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    qz = quantize_int8(load_table(spark, sf_dir, "embeddings"))

    def cached_bytes(df):
        # Start from an empty cache so getRDDStorageInfo reports ONLY this
        # persist — earlier tests may have left tracked persists behind.
        release_tracked()
        spark.catalog.clearCache()
        df = df.persist()
        df.count()
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        size = sum(i.memSize() for i in infos)
        df.unpersist(blocking=True)
        return size

    float_b = cached_bytes(emb)
    int8_b = cached_bytes(qz)
    assert int8_b < float_b / 2, (float_b, int8_b)


def test_semantic_keep_list_covers_corpus_and_keeps_canonicals(spark, sf_dir):
    from ssg_etl_spark.plans.registry import load_all

    spec = load_all(include_extra=True)["semantic_keep_list"]
    rows = {r.vec_id: r for r in spec.builder(spark, sf_dir).collect()}
    emb_ids = {r.vec_id for r in load_table(spark, sf_dir, "embeddings")
               .select("vec_id").collect()}
    assert set(rows) == emb_ids  # one decision per corpus vector
    dropped = [r for r in rows.values() if r.reason == "semantic_dup"]
    assert dropped, "fixture plants semantic near-dups"
    for r in dropped:
        canon = rows[r.canonical_vec_id]
        assert canon.reason == "kept"  # canonical of a cluster stays
        assert r.canonical_vec_id < r.vec_id
    for r in rows.values():
        if r.reason == "kept":
            assert r.canonical_vec_id == r.vec_id


def test_lsh_near_dup_occupancy_guard_bounds_candidates(spark):
    """A dense cluster sharing one sign pattern (identical embeddings) must
    emit star candidates, not the quadratic all-pairs set."""
    from ssg_etl_spark.operators.similarity import lsh_near_dup_pairs

    vec = [1.0, 0.5, -0.25, 0.75]
    rows = [(i, [v + (i % 3) * 1e-6 for v in vec]) for i in range(120)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = lsh_near_dup_pairs(emb, 0.99, max_bucket_occupancy=10)
    got = {(r.vec_a, r.vec_b) for r in pairs.collect()}
    star = {(0, i) for i in range(1, 120)}
    # Every bucket holds all 120 vectors (identical sign patterns), so the
    # guard leaves ONLY the star set — all-pairs would be 7 140.
    assert got == star


def test_ivf_index_roundtrip_equals_oneshot(spark, sf_dir, tmp_path):
    """build_ivf_index → parquet → ivf_topk_vs_index must equal the
    one-shot ivf_topk bit-for-bit (same centroids, same cells, same
    ranking) at full probe AND at default probe."""
    from ssg_etl_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk,
        ivf_topk_vs_index,
    )
    from ssg_etl_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id % 100 = 0").selectExpr(
        "vec_id as query_id", "embedding as query_vec"
    )
    idx = build_ivf_index(emb, n_cells=8)
    idx["centroids"].write.mode("overwrite").parquet(str(tmp_path / "c"))
    idx["cells"].write.mode("overwrite").partitionBy("cell").parquet(
        str(tmp_path / "v")
    )
    loaded_c = spark.read.parquet(str(tmp_path / "c"))
    loaded_v = spark.read.parquet(str(tmp_path / "v"))

    for n_probe in (8, 2):
        oneshot = {
            (r.query_id, r.rank): r.vec_id
            for r in ivf_topk(emb, queries, k=5, n_cells=8, n_probe=n_probe).collect()
        }
        probed = {
            (r.query_id, r.rank): r.vec_id
            for r in ivf_topk_vs_index(
                loaded_c, loaded_v, queries, k=5, n_probe=n_probe
            ).collect()
        }
        assert probed == oneshot

def test_streaming_ivf_append_matches_batch_and_skips_replay(
    spark, sf_dir, tmp_path
):
    """Streaming ANN index maintenance (r12): delta embeddings streamed
    through foreach_batch_ivf_append land in the persisted cells table,
    and probing the streamed index returns EXACTLY what probing a
    one-shot batch assignment of the same corpus returns (same frozen
    centroids, same argmax-dot math). A replayed micro-batch is skipped
    by the manifest watermark — appends are not idempotent, so the skip
    is what keeps the index duplicate-free."""
    from ssg_etl_spark.schemas import EMBEDDINGS
    from ssg_etl_spark.sources.versioning import (
        commit_snapshot,
        read_snapshot,
    )
    from ssg_etl_spark.streaming.pipeline import foreach_batch_ivf_append

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter("vec_id % 10 != 0")
    delta = emb.filter("vec_id % 10 = 0")

    # Offline build on the base corpus: centroids frozen, cells seeded.
    idx = similarity.build_ivf_index(base, n_cells=8)
    cent_path = str(tmp_path / "centroids")
    cells_path = str(tmp_path / "cells")
    idx["centroids"].write.parquet(cent_path)
    commit_snapshot(
        idx["cells"], cells_path, mode="append", meta={"max_batch_id": -1}
    )

    # Stream the delta in 3 files -> 3 micro-batches.
    src = str(tmp_path / "src")
    delta.repartition(3).write.parquet(src)
    apply_fn = foreach_batch_ivf_append(cent_path, cells_path)
    q = (
        spark.readStream.schema(EMBEDDINGS)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(apply_fn)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = read_snapshot(spark, cells_path)
    assert streamed.count() == emb.count()

    # Replay of an already-folded batch id: watermark skips it.
    apply_fn(delta.limit(50), batch_id=0)
    assert read_snapshot(spark, cells_path).count() == emb.count()

    # Probe equality: streamed index == one-shot batch assignment.
    cents = spark.read.parquet(cent_path)
    queries = emb.filter("vec_id % 100 = 0").selectExpr(
        "vec_id AS query_id", "embedding AS query_vec"
    )
    got = sorted(
        tuple(r)
        for r in similarity.ivf_topk_vs_index(
            cents, streamed, queries, k=5
        ).collect()
    )
    batch_cells = idx["cells"].unionByName(
        similarity.ivf_assign(cents, delta)
    )
    want = sorted(
        tuple(r)
        for r in similarity.ivf_topk_vs_index(
            cents, batch_cells, queries, k=5
        ).collect()
    )
    assert got == want and len(got) > 0


def test_streaming_ivf_append_compacts_and_bounds_files(spark, sf_dir, tmp_path):
    """File discipline of the streaming IVF fold (r13, found by the
    60-batch soak: 32 files per commit, O(batches) on-disk growth):
    deltas commit as ONE coalesced file each, inline compaction rewrites
    the chain every compact_every versions CARRYING the replay
    watermark, so file count stays bounded while probe results and the
    replay skip are unchanged."""
    import os

    from ssg_etl_spark.sources.versioning import (
        commit_snapshot,
        read_snapshot,
        snapshot_meta,
        snapshot_versions,
    )
    from ssg_etl_spark.streaming.pipeline import foreach_batch_ivf_append

    emb = load_table(spark, sf_dir, "embeddings")
    idx = similarity.build_ivf_index(emb, n_cells=4)
    cent_path = str(tmp_path / "centroids")
    cells_path = str(tmp_path / "cells")
    idx["centroids"].write.parquet(cent_path)
    commit_snapshot(
        similarity.ivf_assign(idx["centroids"], emb.limit(0)),
        cells_path,
        mode="append",
        meta={"max_batch_id": -1},
    )

    apply_fn = foreach_batch_ivf_append(
        cells_path=cells_path,
        centroids_path=cent_path,
        keep_versions=2,
        compact_every=2,
    )
    for i in range(6):
        apply_fn(emb.filter(f"vec_id % 6 = {i}"), batch_id=i)

    def data_files():
        return sum(
            1
            for _r, _d, names in os.walk(cells_path)
            for n in names
            if n.endswith(".parquet")
        )

    # 6 delta commits + 3 inline compactions: without the discipline
    # this is ~6*shuffle_partitions files; with it, a handful.
    assert data_files() <= 2 + 2 * 2  # compact_every + 2*keep_versions

    # The compaction carried the watermark: a replay of any folded batch
    # is still skipped, and the full index is intact.
    latest = snapshot_meta(cells_path, snapshot_versions(cells_path)[-1])
    assert int(latest["max_batch_id"]) == 5
    n_before = read_snapshot(spark, cells_path).count()
    assert n_before == emb.count()
    apply_fn(emb.filter("vec_id % 6 = 3"), batch_id=3)
    assert read_snapshot(spark, cells_path).count() == n_before

    # Probe equality survives the rewrites.
    cents = spark.read.parquet(cent_path)
    queries = emb.filter("vec_id % 50 = 0").selectExpr(
        "vec_id AS query_id", "embedding AS query_vec"
    )
    got = sorted(
        tuple(r)
        for r in similarity.ivf_topk_vs_index(
            cents, read_snapshot(spark, cells_path), queries, k=5
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in similarity.ivf_topk_vs_index(
            cents, similarity.ivf_assign(cents, emb), queries, k=5
        ).collect()
    )
    assert got == want and len(got) > 0

    import pytest as _p

    with _p.raises(ValueError):
        foreach_batch_ivf_append(cent_path, cells_path, compact_every=0)


def test_precomputed_norm_scoring_bit_equal_to_cosine(spark):
    """The r13 verification rewrite divides a single per-pair dot by
    per-ROW precomputed norms instead of evaluating cosine() (three dots)
    per pair. Same expressions on the same rows ⇒ bit-equal values —
    pinned here over every pair of a fixture that includes a zero vector
    (the NaN edge) and negative/large components."""
    import math

    from pyspark.sql import functions as F

    from ssg_etl_spark.operators.similarity import (
        _to_double,
        cosine,
        dot,
        norm,
    )

    rows = [
        (1, [0.1, -0.2, 0.3]),
        (2, [0.0, 0.0, 0.0]),
        (3, [2.5, 1.0, -3.0]),
        (4, [1e-8, 2e-8, -1e-8]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    a = df.select(
        F.col("vec_id").alias("ia"),
        F.col("embedding").alias("va"),
        _to_double(F.col("embedding")).alias("da"),
        norm(F.col("embedding")).alias("na"),
    )
    b = df.select(
        F.col("vec_id").alias("ib"),
        F.col("embedding").alias("vb"),
        _to_double(F.col("embedding")).alias("db"),
        norm(F.col("embedding")).alias("nb"),
    )
    got = (
        a.crossJoin(b)
        .select(
            cosine(F.col("va"), F.col("vb")).alias("full"),
            (dot(F.col("da"), F.col("db")) / (F.col("na") * F.col("nb"))).alias(
                "pre"
            ),
        )
        .collect()
    )
    assert len(got) == 16
    for r in got:
        if r["full"] is None:  # zero denominator: Spark's / yields NULL
            assert r["pre"] is None
        elif math.isnan(r["full"]):
            assert math.isnan(r["pre"])
        else:
            assert r["full"] == r["pre"]  # bit-exact, not approx
