"""Similarity search over embedding columns: brute-force cosine top-k (the
exactness baseline) and an LSH-bucketed approximate variant (the scale
path). BASELINE.json north-star extension.

Embeddings are ``array<float>``; all math is promoted to double before any
arithmetic so results are engine-portable (and match the DuckDB oracle
bit-for-bit: both engines fold the dot product left-to-right in index
order).

Scale design: brute-force is O(Q·N) — fine when the query set is small and
broadcast; the banded LSH variant prunes N to bucket-mates, trading recall
for a ~bucket-count speedup. At 100 TB, partition embeddings by bucket and
broadcast the query signatures.

OPERATIONAL DEFAULT (r9 sf1.0 sweep, tools/sf1_embedding_r9.json; decision
table in COVERAGE.md "Decade conclusions"): use the INT8-QUANTIZED EXACT
scan (``quantize_int8`` storage + ``dequantize`` into the brute-force
top-k, the `ann_quantized_topk` composition) as the default ANN path —
at 20k vectors it measured recall 0.990 (1.000 on cosine ≥ 0.5 pairs) at
2× the speed of full-precision brute force, beating every index path
(LSH auto-tables 0.47, IVF 0.46) outright. Index structures earn their
keep only past brute-force scale: switch to the persisted IVF index
(``build_ivf_index``/``ivf_topk_vs_index``) once per-executor quantized
scan cost exceeds the probe cost — i.e. when N · d bytes (int8) outgrows
what a scan can stream per query batch, roughly N ≳ 10⁷ at d=128 — and
keep ``lsh_bucketed_topk_auto`` for the self-join (near-dup) shape where
a query set never materializes. Sign-LSH cannot promise recall for
weak-cosine (<0.5) neighbors at any config; treat its recall numbers as
the honest cost of sublinearity, not a tuning failure.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ssg_etl_spark.cache import persist_tracked
from ssg_etl_spark.operators.lsh import (
    DEFAULT_MAX_BUCKET_OCCUPANCY,
    capped_probe_join_pairs,
    capped_self_join_pairs,
)
from ssg_etl_spark.partitioning import VECTOR_BYTES_PER_TASK, fan_out


# Target mean bucket occupancy for auto-scaled sign-pattern LSH: small
# enough that the Σ occupancy² candidate term stays executor-sized, large
# enough that near neighbors still collide.
AUTO_BITS_TARGET_OCCUPANCY = 150


def auto_bits_per_table(
    embeddings: DataFrame,
    target_occupancy: int = AUTO_BITS_TARGET_OCCUPANCY,
    n: int | None = None,
) -> int:
    """bits ≈ log2(N / target_occupancy), floored at 3 — the bucket space
    MUST grow with the corpus: sign-pattern tables have only 2^bits
    buckets, so a pinned small ``bits_per_table`` at corpus scale makes
    EVERY bucket oversized and the occupancy guard's star fallback would
    quietly replace candidate generation wholesale (recall collapse —
    hot sign-pattern buckets are mostly UNRELATED vectors, unlike a hot
    64-bit MinHash bucket, which really is one duplicate family). Costs
    one eager count job unless ``n`` (a known corpus size — e.g. recorded
    index metadata) is supplied; callers that replay a pinned
    bucketization (the oracle-checked registry queries, fixture tests)
    pass explicit bits and skip it entirely. The same scaling rule
    tools/scale_sweep.py applies manually per scale step.
    """
    if n is None:
        n = embeddings.count()
    # Integer-exact ceil(log2(n / occupancy)): ceil(log2(x)) ==
    # ceil(log2(ceil(x))) (2^b is an integer, so 2^b >= x iff
    # 2^b >= ceil(x)), and (m-1).bit_length() is ceil(log2(m)) for m >= 1.
    # The float-log form this replaces could jitter ±1 bit when n sits at
    # an exact power-of-two multiple of the occupancy — a SQL oracle
    # replaying the same rule must never disagree by a whole bucket bit
    # (r9; same value everywhere else).
    m = max(2, -(-int(n) // int(target_occupancy)))
    return max(3, (m - 1).bit_length())


def auto_tables_for_recall(
    bits_per_table: int,
    target_recall: float = 0.9,
    at_cosine: float = 0.7,
    max_tables: int = 64,
) -> int:
    """Table count that HOLDS recall as ``auto_bits_per_table`` grows.

    Sign-pattern LSH recall for a pair at cosine s is ``1-(1-p^b)^L``
    with ``p = 1 - arccos(s)/π``: scaling b with the corpus (required —
    see :func:`auto_bits_per_table`) shrinks ``p^b`` geometrically, so a
    FIXED L silently loses recall as data grows (measured at sf0.1:
    L=8 at auto-bits → 0.655 recall@10; L=16 → 0.88). Inverting the
    formula, ``L = ceil(ln(1-R) / ln(1-p^b))`` holds recall R at the
    design cosine. Candidate cost grows linearly in L while bucket
    occupancy stays constant — the right trade at scale, bounded by
    ``max_tables`` as a runaway guard (hit only at extreme b × R).
    """
    import math

    if not (0.0 < target_recall < 1.0):
        raise ValueError("target_recall must be in (0, 1)")
    if not (-1.0 < at_cosine < 1.0):
        raise ValueError("at_cosine must be in (-1, 1)")
    if bits_per_table < 1:
        raise ValueError("bits_per_table must be positive")
    p = 1.0 - math.acos(at_cosine) / math.pi
    miss = 1.0 - p**bits_per_table
    if miss <= 0.0:
        return 1
    return min(max_tables, max(1, math.ceil(math.log(1.0 - target_recall) / math.log(miss))))


def _to_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold of the element products (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    a, b = _to_double(a), _to_double(b)
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def norm(a: Column) -> Column:
    """L2 norm, same fold order as :func:`cosine`'s denominators."""
    d = _to_double(a)
    return F.sqrt(dot(d, d))


def brute_force_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 10
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    ``queries`` is a (query_id, query_vec) DataFrame — small by contract,
    broadcast to every partition; the corpus is scanned once. Per-query
    ranking is a window over the query partition (rank-limit pushdown keeps
    only k rows per partition before the final shuffle).
    """
    # Norms precomputed per row (N + Q folds instead of 3·N·Q): the final
    # dot/(norm_a·norm_b) is the identical expression the oracle evaluates
    # per pair, so results are bit-equal. fan_out: the N×Q scoring stage is
    # the whole cost — never leave it on a few-split scan.
    corpus = fan_out(embeddings).select(
        "vec_id",
        _to_double(F.col("embedding")).alias("_emb_d"),
        norm(F.col("embedding")).alias("_norm"),
    )
    qn = queries.select(
        "query_id",
        _to_double(F.col("query_vec")).alias("_q_d"),
        norm(F.col("query_vec")).alias("_qnorm"),
    )
    joined = corpus.crossJoin(F.broadcast(qn))
    sim = dot(F.col("_q_d"), F.col("_emb_d")) / (F.col("_qnorm") * F.col("_norm"))
    scored = joined.filter(F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        "vec_id",
        sim.alias("cosine_sim"),
    )
    return _rank_topk(scored, k)


def filtered_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    filter_col: str = "label",
    k: int = 10,
) -> DataFrame:
    """Metadata-filtered similarity search: each query ranks only corpus
    vectors sharing its ``filter_col`` value — "nearest neighbors within
    my category/language/shard", the other half of production vector
    search next to unfiltered ANN.

    ``queries`` carries (query_id, query_vec, ``filter_col``). The corpus
    joins the broadcast queries on the filter column, so only matching
    rows are ever scored; at 100 TB, partition (or cluster) the corpus
    by the filter column and this equi-join becomes a pruned scan — the
    selectivity of the filter is the speedup, with exact results (no
    recall loss, unlike post-filtering an ANN candidate list, which
    starves k when the filter is selective).
    """
    corpus = fan_out(embeddings).select(
        filter_col,
        "vec_id",
        _to_double(F.col("embedding")).alias("_emb_d"),
        norm(F.col("embedding")).alias("_norm"),
    )
    qn = queries.select(
        F.col(filter_col),
        "query_id",
        _to_double(F.col("query_vec")).alias("_q_d"),
        norm(F.col("query_vec")).alias("_q_norm"),
    )
    scored = (
        corpus.join(F.broadcast(qn), filter_col)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (
                dot(F.col("_emb_d"), F.col("_q_d"))
                / (F.col("_norm") * F.col("_q_norm"))
            ).alias("cosine_sim"),
        )
    )
    return _rank_topk(scored, k)


def label_votes_from_candidates(candidates: DataFrame, k: int = 5) -> DataFrame:
    """The vote/majority stage of k-NN noisy-label detection, decoupled
    from neighbor generation: consumes ANY scored candidate set with
    columns (vec_id, label, nbr_id, nbr_label, cosine_sim) — all pairs,
    LSH bucket-mates, IVF cell-mates — ranks each vector's candidates,
    keeps the top ``k``, and votes.

    Returns (vec_id, label, majority_label, n_agree, agree_ratio) with
    majority ties broken toward the smallest label; ranking ties break on
    ascending nbr_id (deterministic, oracle-replayable). A vector with
    fewer than ``k`` candidates votes among what it has; a vector with
    none is absent from the output (the candidate generator's recall
    contract, not this stage's).
    """
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cosine_sim"), F.asc("nbr_id")
    )
    # Persisted (r13): the top-k set feeds BOTH the majority vote and the
    # agreement aggregate — unpersisted, the entire candidate-scoring
    # pipeline (bucket join + per-pair cosines upstream) evaluated twice
    # (two identical heavy stages in the metrics: 22.6 s executorCpuTime
    # each at sf0.1, byte-identical shuffle writes). k rows per vector —
    # k× smaller than the candidate set it reduces.
    knn = persist_tracked(
        candidates.withColumn("_rank", F.row_number().over(w)).filter(
            F.col("_rank") <= k
        )
    )
    votes = knn.groupBy("vec_id", "label", "nbr_label").agg(
        F.count(F.lit(1)).alias("_votes")
    )
    wv = Window.partitionBy("vec_id").orderBy(
        F.desc("_votes"), F.asc("nbr_label")
    )
    majority = (
        votes.withColumn("_vr", F.row_number().over(wv))
        .filter(F.col("_vr") == 1)
        .select("vec_id", "label", F.col("nbr_label").alias("majority_label"))
    )
    agree = knn.groupBy("vec_id").agg(
        F.sum(
            F.when(F.col("nbr_label") == F.col("label"), 1).otherwise(0)
        ).cast("long").alias("n_agree"),
        F.count(F.lit(1)).alias("_n"),
    )
    return majority.join(agree, "vec_id").select(
        "vec_id",
        "label",
        "majority_label",
        "n_agree",
        F.round(F.col("n_agree") / F.col("_n"), 6).alias("agree_ratio"),
    )


def knn_label_agreement(
    embeddings: DataFrame, k: int = 5, label_col: str = "label"
) -> DataFrame:
    """Noisy-label detection: for every vector, the label vote of its k
    nearest neighbors. A labeled example whose neighbors disagree with its
    own label is a mislabeling candidate (confident-learning's core
    signal) — the standard quality gate on labeled/synthetic training
    embeddings.

    This exact form scores all pairs (the O(N²) exactness baseline, like
    :func:`embedding_near_dup_pairs`); the vote stage is the shared
    :func:`label_votes_from_candidates`, which at scale consumes the
    LSH candidate set instead (:func:`knn_label_agreement_lsh`).
    """
    with_norm = embeddings.select(
        "vec_id",
        F.col(label_col).alias("_lbl"),
        _to_double(F.col("embedding")).alias("_emb_d"),
        norm(F.col("embedding")).alias("_norm"),
    )
    a = with_norm.alias("a")
    b = with_norm.alias("b")
    sim = dot(F.col("a._emb_d"), F.col("b._emb_d")) / (
        F.col("a._norm") * F.col("b._norm")
    )
    scored = a.join(b, F.col("a.vec_id") != F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("vec_id"),
        F.col("a._lbl").alias("label"),
        F.col("b._lbl").alias("nbr_label"),
        sim.alias("cosine_sim"),
        F.col("b.vec_id").alias("nbr_id"),
    )
    return label_votes_from_candidates(scored, k)


def knn_label_agreement_lsh(
    embeddings: DataFrame,
    k: int = 5,
    label_col: str = "label",
    n_tables: int = 8,
    bits_per_table: int | None = None,
) -> DataFrame:
    """Scale-path noisy-label detection: the SAME vote stage as
    :func:`knn_label_agreement`, fed from LSH bucket-mate candidates
    instead of all pairs — each vector votes over its k most-similar
    bucket-mates, so cost ~ O(corpus + Σ bucket_occupancy²), not N².

    Candidate generation mirrors :func:`lsh_near_dup_pairs` (undirected
    ``<`` self-join + distinct, then both orientations via union — half
    the dedup work of a directed join) and carries ids only through the
    bucket shuffle; labels and vectors re-join on the candidate ids.
    A vector sharing no bucket with anyone is absent from the output —
    at real corpus sizes buckets are never singleton; the pytest pins
    coverage + agreement against the exact baseline on the fixture.
    Deterministic anchors → SQL-replayable, approximation included.
    """
    if bits_per_table is None:
        bits_per_table = auto_bits_per_table(embeddings)
    anchor_list = _hyperplane_anchor_list(embeddings, n_tables * bits_per_table)
    # Persisted: the occupancy-guarded join consumes the postings several
    # times, and each recompute redoes the anchor dot products.
    b = persist_tracked(
        _bucketize(
            embeddings, anchor_list, "vec_id", "embedding", n_tables,
            bits_per_table,
        ).select("vec_id", "table", "bucket")
    )
    # Same occupancy backstop as lsh_near_dup_pairs: in a degenerate
    # bucket the member still votes (the star keeps rep↔member pairs in
    # both directions below) with candidates from its other tables —
    # bounded work instead of an occupancy² blowup.
    undirected = capped_self_join_pairs(
        b, ["table", "bucket"], "vec_id", "_u", "_v",
        DEFAULT_MAX_BUCKET_OCCUPANCY,
    )
    # Both orientations via a per-row explode, not a union of two scans
    # (r13): the union form evaluated the whole occupancy-guarded
    # candidate join twice (the branches differ by a projection, so
    # exchange reuse cannot fire) — stage metrics showed the bucket
    # self-join exchanges quadrupled (2 sides × 2 evaluations). Same
    # rows, same multiplicity, one evaluation.
    directed = undirected.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("_u").alias("vec_id"), F.col("_v").alias("nbr_id")
                ),
                F.struct(
                    F.col("_v").alias("vec_id"), F.col("_u").alias("nbr_id")
                ),
            )
        ).alias("_e")
    ).select(F.col("_e.vec_id").alias("vec_id"), F.col("_e.nbr_id").alias("nbr_id"))
    ea = embeddings.select(
        F.col("vec_id"),
        F.col(label_col).alias("label"),
        _to_double(F.col("embedding")).alias("_ea"),
        norm(F.col("embedding")).alias("_na"),
    )
    eb = embeddings.select(
        F.col("vec_id").alias("nbr_id"),
        F.col(label_col).alias("nbr_label"),
        _to_double(F.col("embedding")).alias("_eb"),
        norm(F.col("embedding")).alias("_nb"),
    )
    scored = (
        directed.join(ea, "vec_id")
        .join(eb, "nbr_id")
        .select(
            "vec_id",
            "label",
            "nbr_id",
            "nbr_label",
            (
                dot(F.col("_ea"), F.col("_eb")) / (F.col("_na") * F.col("_nb"))
            ).alias("cosine_sim"),
        )
    )
    return label_votes_from_candidates(scored, k)


def label_centroid_outliers(
    embeddings: DataFrame, label_col: str = "label"
) -> DataFrame:
    """Embedding outlier scoring: cosine of every vector to its label's
    centroid — the tail of low scores flags corrupt embeddings, wrong
    labels, and off-distribution samples per class.

    Cosine is scale-invariant in the second argument, so the "centroid"
    is the per-label decimal SUM vector, never divided by the count:
    decimal sums are order-independent and cast to double exactly in
    both engines, which keeps the whole operator oracle-replayable with
    no float-mean drift. One posexplode + one (label, dim) aggregation
    (map-side combinable) + a broadcast join of label-count-sized
    centroid rows.
    """
    ed = embeddings.select(
        "vec_id",
        F.col(label_col).alias("label"),
        _to_double(F.col("embedding")).alias("_e"),
    )
    dims = ed.select("label", F.posexplode("_e").alias("_pos", "_v"))
    sums = dims.groupBy("label", "_pos").agg(
        F.sum(F.col("_v").cast("decimal(28,12)")).cast("double").alias("_s")
    )
    cent = (
        sums.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("_pos", "_s"))).alias("_ps"))
        .select("label", F.transform("_ps", lambda p: p["_s"]).alias("_c"))
    )
    cos = dot(F.col("_e"), F.col("_c")) / (
        F.sqrt(dot(F.col("_e"), F.col("_e")))
        * F.sqrt(dot(F.col("_c"), F.col("_c")))
    )
    return ed.join(F.broadcast(cent), "label").select(
        "vec_id", "label", F.round(cos, 6).alias("centroid_cosine")
    )


def embedding_near_dup_pairs(embeddings: DataFrame, threshold: float) -> DataFrame:
    """All embedding pairs with cosine ≥ threshold (exact, self-join form).

    O(N²) by definition — the exactness baseline the LSH path approximates.
    Norms are precomputed per row (not per pair), which is bit-identical to
    the per-pair form: the pair expression stays dot/(norm_a·norm_b).
    """
    with_norm = embeddings.select(
        "vec_id",
        _to_double(F.col("embedding")).alias("_emb_d"),
        norm(F.col("embedding")).alias("_norm"),
    )
    a = with_norm.alias("a")
    b = with_norm.alias("b")
    sim = dot(F.col("a._emb_d"), F.col("b._emb_d")) / (
        F.col("a._norm") * F.col("b._norm")
    )
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            sim.alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Shared top-k tail: deterministic rank (sim desc, id asc) per query.
    One copy so tie-breaking stays bit-identical across the exact and both
    approximate operators (the IVF exactness test depends on it)."""
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "cosine_sim")
    )


def _unit_corpus(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, original vec, unit-normalized vec) — spherical k-means operates
    on unit vectors, where cosine == dot.

    Zero-norm vectors are dropped: cosine is undefined for them, and an
    all-NULL unit vector would otherwise poison centroid seeding and make
    cell assignment NULL-ordering-driven.

    Size-aware fan (r13, measured per-site): every `_unit_corpus`
    consumer is the k-means-style small-vector regime — iterative
    assignment/probe jobs whose per-task fixed cost dominates sub-KB
    tasks — and the size-derived width beat the blanket fan interleaved
    at sf0.1 (ann_ivf_topk medians 2.79 → 2.26 s). The LSH `_bucketize`
    path measured the OTHER way (blanket 1.30 vs sized 1.60 — its
    n_tables-way explode work needs the full fan) and keeps the blanket
    form."""
    d = fan_out(df, bytes_per_task=VECTOR_BYTES_PER_TASK).select(
        id_col,
        F.col(vec_col),
        _to_double(F.col(vec_col)).alias("_d"),
        norm(F.col(vec_col)).alias("_norm"),
    )
    return d.filter(F.col("_norm") > 0).select(
        id_col,
        vec_col,
        F.transform("_d", lambda x: x / F.col("_norm")).alias("_unit"),
    )


def _cells_by_distance(unit: Column) -> Column:
    """array<struct<neg_sim,cell>> sorted best-first (struct sort: neg_sim
    ascending = similarity descending, cell id breaks ties)."""
    scored = F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            (-dot(c["vec"], unit)).alias("neg_sim"), c["cell"].alias("cell")
        ),
    )
    return F.array_sort(scored)


def _cent_list(cdf: DataFrame):
    """Single-row broadcast array<struct<cell,vec>> of centroids (no
    driver collect; array_sort makes the fold order deterministic)."""
    return F.broadcast(
        cdf.groupBy().agg(
            F.array_sort(F.collect_list(F.struct("cell", "vec"))).alias("_cents")
        )
    )


def build_ivf_index(
    embeddings: DataFrame,
    n_cells: int = 16,
    train_iters: int = 2,
    train_mod: int = 1,
) -> dict[str, DataFrame]:
    """The PRECOMPUTED side of IVF ANN — train centroids and assign the
    corpus once, persist both as tables, and every subsequent query batch
    pays only its own probe cost (the ANN twin of
    ``dedup.build_minhash_index``; at 100 TB the index build is the
    expensive amortizable step, and re-training spherical k-means per
    query call — the pre-r6 shape — repeats Lloyd rounds over the full
    corpus every time).

    Spherical k-means, fully declarative and deterministic (no RNG, no
    driver-side model state): seeds are the first ``n_cells`` corpus
    vectors by id; each Lloyd round is assign (argmax dot against the
    broadcast centroid list) + per-dimension mean (decimal-summed →
    order-independent) + renormalize. Train on a modular sample
    (``train_mod``: vec_id % mod == 0 — deterministic, no ``sample()``).

    Returns ``{"centroids", "cells"}``:

    * ``centroids`` — (cell, vec array<double>), model-sized; parquet
      round-trips exactly (doubles, no driver state).
    * ``cells`` — (vec_id, embedding, cell): the inverted file. At 100 TB
      write it partitioned by ``cell`` so a probe reads only the
      ``n_probe`` cells it needs (partition pruning on the probe join).
    """
    # Persisted: the unit-normalized corpus is re-scanned every Lloyd round
    # and again for the final cell assignment (the standard k-means cache;
    # MEMORY_AND_DISK spills rather than OOMs at scale).
    corpus = persist_tracked(_unit_corpus(embeddings, "vec_id", "embedding"))
    train = corpus.filter(F.col("vec_id") % train_mod == 0) if train_mod > 1 else corpus

    # Seed centroid list: first n_cells unit vectors, shaped like the LSH
    # anchor list (single-row broadcast array — no collect).
    # Cell labels need not be dense — the seed's vec_id IS the cell id
    # (avoids a global row_number over the seed set).
    cents = (
        train.orderBy("vec_id")
        .limit(n_cells)
        .select(F.col("vec_id").alias("cell"), F.col("_unit").alias("vec"))
    )

    dec = "decimal(28,12)"  # unit components are ≤1 in magnitude
    for _ in range(train_iters):
        assigned = train.crossJoin(_cent_list(cents)).select(
            "_unit",
            F.element_at(_cells_by_distance(F.col("_unit")), 1)["cell"].alias("_cell"),
        )
        per_dim = (
            assigned.select("_cell", F.posexplode("_unit").alias("_pos", "_v"))
            .groupBy("_cell", "_pos")
            .agg(
                (F.sum(F.col("_v").cast(dec)) / F.count(F.lit(1)))
                .cast("double")
                .alias("_m")
            )
        )
        raw = (
            per_dim.groupBy("_cell")
            .agg(F.array_sort(F.collect_list(F.struct("_pos", "_m"))).alias("_pm"))
            .select(
                F.col("_cell").alias("cell"),
                F.transform("_pm", lambda p: p["_m"]).alias("_raw"),
            )
        )
        # Persist each round's centroids (n_cells tiny rows): the next
        # round's assignment and the two final consumers (corpus cells,
        # query probes) would otherwise re-run every earlier round's
        # aggregation recursively.
        cents = persist_tracked(
            raw.select(
                "cell",
                F.transform(
                    "_raw",
                    lambda x: x
                    / F.sqrt(
                        F.aggregate("_raw", F.lit(0.0), lambda acc, y: acc + y * y)
                    ),
                ).alias("vec"),
            )
        )

    corpus_cells = corpus.crossJoin(_cent_list(cents)).select(
        "vec_id",
        "embedding",
        F.element_at(_cells_by_distance(F.col("_unit")), 1)["cell"].alias("cell"),
    )
    return {"centroids": cents, "cells": corpus_cells}


def ivf_assign(centroids: DataFrame, embeddings: DataFrame) -> DataFrame:
    """Assign vectors to PRE-TRAINED IVF centroids: the cells-table rows
    (``vec_id, embedding, cell``) for any new batch, identical math to
    :func:`build_ivf_index`'s final corpus assignment (argmax dot
    against the broadcast centroid list — one scan + project, no
    shuffle, no re-training). This is the maintenance half of the IVF
    story: at 100 TB/day the index is a persisted table and every
    ingest batch pays only its own assignment cost; the streaming fold
    (streaming/pipeline.foreach_batch_ivf_append) drives this per
    micro-batch so the probe-ready inverted file stays current."""
    unit = _unit_corpus(embeddings, "vec_id", "embedding")
    return unit.crossJoin(_cent_list(centroids)).select(
        "vec_id",
        "embedding",
        F.element_at(_cells_by_distance(F.col("_unit")), 1)["cell"].alias("cell"),
    )


def ivf_topk_vs_index(
    centroids: DataFrame,
    cells: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Probe a prebuilt IVF index (:func:`build_ivf_index`): each query
    exactly re-ranks only its ``n_probe`` nearest cells' members. Recall
    misses only neighbors assigned to unprobed cells — raise ``n_probe``
    to trade work for recall. Per-query work is cell occupancy × n_probe,
    not corpus size; the corpus is never re-trained or re-assigned."""
    q = _unit_corpus(queries, "query_id", "query_vec")
    query_probes = (
        q.crossJoin(_cent_list(centroids))
        .select(
            "query_id",
            "query_vec",
            norm(F.col("query_vec")).alias("_qnorm"),
            F.explode(
                F.transform(
                    F.slice(_cells_by_distance(F.col("_unit")), 1, n_probe),
                    lambda s: s["cell"],
                )
            ).alias("cell"),
        )
    )
    # Norms once per row (query side above, corpus side here), not per
    # candidate pair inside cosine(): identical value, one interpreted
    # dot per (query, cell-mate) instead of three.
    cells_n = cells.withColumn("_cnorm", norm(F.col("embedding")))
    candidates = cells_n.join(F.broadcast(query_probes), "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    sim = dot(_to_double(F.col("query_vec")), _to_double(F.col("embedding"))) / (
        F.col("_qnorm") * F.col("_cnorm")
    )
    return _rank_topk(
        candidates.select("query_id", "vec_id", sim.alias("cosine_sim")), k
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    train_iters: int = 2,
    train_mod: int = 1,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index — the clustered
    alternative to :func:`lsh_bucketed_topk`. One-shot composition of
    :func:`build_ivf_index` + :func:`ivf_topk_vs_index`; repeated query
    batches should build once, write the index tables, and probe."""
    idx = build_ivf_index(embeddings, n_cells, train_iters, train_mod)
    return ivf_topk_vs_index(idx["centroids"], idx["cells"], queries, k, n_probe)


def _hyperplane_anchor_list(embeddings: DataFrame, n_anchors: int):
    """Deterministic projection directions: the first ``n_anchors`` corpus
    vectors by id, collected into a single-row broadcast array (no RNG, no
    driver collect)."""
    anchors = (
        embeddings.orderBy("vec_id")
        .limit(n_anchors)
        .select(F.col("vec_id").alias("anchor_id"), F.col("embedding").alias("anchor_vec"))
    )
    return F.broadcast(
        anchors.groupBy().agg(
            F.array_sort(
                F.collect_list(F.struct("anchor_id", "anchor_vec"))
            ).alias("anchors")
        )
    )


def _table_buckets(vec: Column, n_tables: int, bits_per_table: int) -> Column:
    """array<struct<table,bucket>>: per-table sign-pattern bucket ids
    against the broadcast ``anchors`` column."""
    bits = F.transform(
        F.col("anchors"),
        lambda a: F.when(
            dot(_to_double(a["anchor_vec"]), _to_double(vec)) > 0, 1
        ).otherwise(0),
    )
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_tables - 1)),
        lambda t: F.struct(
            t.alias("table"),
            F.aggregate(
                F.slice(bits, t * bits_per_table + 1, bits_per_table),
                F.lit(0).cast("long"),
                lambda acc, bit: acc * 2 + bit,
            ).alias("bucket"),
        ),
    )


def _bucketize(
    df: DataFrame,
    anchor_list,
    id_col: str,
    vec_col: str,
    n_tables: int,
    bits_per_table: int,
) -> DataFrame:
    """One row per (id, table, bucket), vector carried along for scoring,
    plus ``_vnorm`` — the vector's L2 norm computed ONCE per input row,
    BEFORE the n_tables-way explode (r13): verification stages used to
    recompute both norms per candidate pair inside ``cosine()``, tripling
    the per-pair interpreted dot-product work; scoring now divides by the
    carried norms (bit-identical — the same norm expression on the same
    row, evaluated once).
    fan_out: the per-row × per-anchor dot products are the CPU stage."""
    return (
        fan_out(df).crossJoin(anchor_list)
        .select(
            id_col,
            vec_col,
            norm(F.col(vec_col)).alias("_vnorm"),
            F.explode(
                _table_buckets(F.col(vec_col), n_tables, bits_per_table)
            ).alias("tb"),
        )
        .select(id_col, vec_col, "_vnorm", "tb.table", "tb.bucket")
    )


def lsh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_tables: int | None = 8,
    bits_per_table: int | None = None,
) -> DataFrame:
    """Approximate top-k: banded random-hyperplane LSH (OR-construction).

    ``n_tables`` independent hash tables, each bucketing on the sign pattern
    of ``bits_per_table`` hyperplanes (the first ``n_tables*bits_per_table``
    corpus vectors serve as deterministic projection directions — no RNG).
    A corpus vector is a candidate for a query if they share a bucket in ANY
    table; candidates are deduped, then exactly scored and ranked.

    Recall for a pair at angle θ is 1-(1-p^b)^L with p = 1-θ/π — tunable via
    (L, b); L=8, b=3 gives ≈0.94 at cosine 0.5. ``bits_per_table=None``
    (the default) auto-scales b with corpus size via
    :func:`auto_bits_per_table` so bucket occupancy — and with it the
    Σ occupancy² candidate cost — stays roughly constant as the corpus
    grows. A FIXED L then loses recall as b climbs (measured r8, sf0.1:
    L=8 → 0.655 recall@10; L=16 → 0.88): pass ``n_tables=None`` to pick
    L from the recall formula at the scaled b
    (:func:`auto_tables_for_recall`, 0.9 @ cosine 0.7 by default), the
    recall-stable operational config. Callers wanting a pinned
    bucketization (oracle replay, fixture tests) pass both explicitly.
    At 100 TB: the exploded (table, bucket) corpus is the partitioning
    key, query signatures broadcast, so each executor scores only its
    bucket-mates — work scales with bucket occupancy × L, not corpus
    size.
    """
    if bits_per_table is None:
        bits_per_table = auto_bits_per_table(embeddings)
    if n_tables is None:
        n_tables = auto_tables_for_recall(bits_per_table)
    anchor_list = _hyperplane_anchor_list(embeddings, n_tables * bits_per_table)
    emb_b = _bucketize(
        embeddings, anchor_list, "vec_id", "embedding", n_tables, bits_per_table
    ).withColumnRenamed("_vnorm", "_enorm")
    q_b = _bucketize(
        queries, anchor_list, "query_id", "query_vec", n_tables, bits_per_table
    ).withColumnRenamed("_vnorm", "_qnorm")

    candidates = (
        emb_b.join(F.broadcast(q_b), ["table", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "vec_id"])
    )
    # Per-pair dot over per-row carried norms (see _bucketize): identical
    # value to cosine(), one interpreted dot per pair instead of three.
    sim = dot(_to_double(F.col("query_vec")), _to_double(F.col("embedding"))) / (
        F.col("_qnorm") * F.col("_enorm")
    )
    return _rank_topk(
        candidates.select("query_id", "vec_id", sim.alias("cosine_sim")), k
    )


def lsh_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float,
    n_tables: int = 8,
    bits_per_table: int | None = None,
    max_bucket_occupancy: int | None = DEFAULT_MAX_BUCKET_OCCUPANCY,
) -> DataFrame:
    """Scale-path near-duplicate pairs: LSH bucket SELF-join for candidate
    generation + exact cosine verification — the corpus-sized twin of
    :func:`embedding_near_dup_pairs` (which is O(N²) by contract).

    A pair is a candidate iff it shares a (table, bucket) in ANY of the
    ``n_tables`` sign-pattern tables; only candidates are exactly scored,
    so cost ~ O(corpus + Σ bucket_occupancy²) instead of N². Misses only
    pairs that collide in NO table (P(miss) = (1-p^b)^L, p = 1-θ/π);
    every emitted pair is exactly verified, so there are no false
    positives. The whole pipeline is deterministic (anchor hyperplanes =
    first corpus vectors), hence SQL-replayable for the oracle,
    approximation included.
    """
    if bits_per_table is None:
        bits_per_table = auto_bits_per_table(embeddings)
    anchor_list = _hyperplane_anchor_list(embeddings, n_tables * bits_per_table)
    # The self-join shuffles the 8×-exploded corpus on (table, bucket) —
    # ids only: carrying dim-sized vectors through that shuffle would
    # multiply its bytes by the embedding width. Vectors re-join on the
    # candidate ids afterwards (candidates are near-dup-sized, and the
    # id-equi-joins shuffle corpus-sized rows once each). Persisted: the
    # occupancy-guarded join (lsh.capped_self_join_pairs) consumes the
    # postings several times, and each recompute would redo the
    # 24-hyperplane dot products over the corpus.
    b = persist_tracked(
        _bucketize(
            embeddings, anchor_list, "vec_id", "embedding", n_tables, bits_per_table
        ).select("vec_id", "table", "bucket")
    )
    # Occupancy guard: a dense embedding cluster sharing a sign pattern
    # would make the bucket self-join quadratic in that bucket; oversized
    # (table, bucket) groups emit star candidates around their min vec_id
    # instead (connectivity preserved, count bounded — see operators/lsh.py).
    candidates = capped_self_join_pairs(
        b, ["table", "bucket"], "vec_id", "vec_a", "vec_b",
        max_bucket_occupancy,
    )
    # Norms once per corpus row, not per candidate pair inside cosine():
    # identical value, one interpreted dot per pair instead of three
    # (the verification stage was the query's dominant CPU — 45.7 s
    # executorCpuTime at sf0.1, ~2/3 of it the two per-pair self-dots).
    ea = embeddings.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("_ea"),
        norm(F.col("embedding")).alias("_na"),
    )
    eb = embeddings.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("_eb"),
        norm(F.col("embedding")).alias("_nb"),
    )
    sim = dot(_to_double(F.col("_ea")), _to_double(F.col("_eb"))) / (
        F.col("_na") * F.col("_nb")
    )
    return (
        candidates.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select("vec_a", "vec_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def quantize_int8(
    embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: q_i = round(x_i · 127 /
    max|x|), stored with the per-vector scale — 4× smaller than float32 at
    <1% cosine error for typical embedding distributions, which at 100 TB
    is the difference between an index that fits executor memory and one
    that spills. Pure Column expressions (transform + aggregate fold);
    zero-vector rows get scale 0 and an all-zero code (dequantizes to the
    zero vector rather than NaN).

    Cosine over dequantized codes is scale-invariant in the stored scale,
    so ANN over a quantized corpus needs q · 127/max|x| undone only when
    mixing quantized and float sides.
    """
    d = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    amax = F.aggregate(
        d, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    scale = amax / F.lit(127.0)
    # tinyint, not int: the whole point is byte-per-dimension storage —
    # Spark's columnar cache stores array<int> at 4 bytes/element, undoing
    # the compression (measured in tests/test_similarity.py).
    codes = F.when(
        amax == 0, F.transform(d, lambda x: F.lit(0).cast("tinyint"))
    ).otherwise(
        F.transform(d, lambda x: F.round(x / (amax / 127.0)).cast("tinyint"))
    )
    return embeddings.select(
        F.col(id_col),
        codes.alias("codes"),
        F.round(scale, 9).alias("scale"),
    )


def dequantize(
    quantized: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """Inverse of :func:`quantize_int8`: x̂_i = q_i · scale."""
    return quantized.select(
        F.col(id_col),
        F.transform(
            F.col("codes"), lambda q: q.cast("double") * F.col("scale")
        ).alias("embedding"),
    )


def lsh_near_dup_pairs_incremental(
    base: DataFrame,
    delta: DataFrame,
    threshold: float,
    n_tables: int = 8,
    bits_per_table: int | None = None,
    base_count: int | None = None,
) -> DataFrame:
    """Semantic near-dup of NEW embeddings against an EXISTING corpus —
    the embedding twin of ``dedup.minhash_lsh_pairs_incremental``: the
    bucket join is delta×base, so the base×base term never exists; returns
    (vec_new, vec_base, cosine_sim) mixed pairs only. Anchor hyperplanes
    come from the BASE (the stable reference — at scale the anchors and
    the base's (table, bucket) postings are a persisted index keyed by
    bucket; each batch bucketizes the delta only and probes). Ids only
    ride the bucket shuffle; vectors re-join on the candidate ids.

    Per-micro-batch callers should pass ``bits_per_table`` (a pinned
    bucketization matching their persisted index) or ``base_count`` (the
    corpus size from index metadata): auto-scaling bits without either
    re-counts — i.e. re-evaluates — the full base lineage EVERY batch.
    """
    if bits_per_table is None:
        bits_per_table = auto_bits_per_table(base, n=base_count)
    anchor_list = _hyperplane_anchor_list(base, n_tables * bits_per_table)
    # Persisted: the guarded probe join consumes the base postings twice
    # (occupancy aggregation + join), and each recompute redoes the
    # anchor dot products over the base corpus.
    bb = persist_tracked(
        _bucketize(
            base, anchor_list, "vec_id", "embedding", n_tables, bits_per_table
        ).select(F.col("vec_id").alias("vec_base"), "table", "bucket")
    )
    db = _bucketize(
        delta, anchor_list, "vec_id", "embedding", n_tables, bits_per_table
    ).select(F.col("vec_id").alias("vec_new"), "table", "bucket")
    # Base-side occupancy guard: a dense base sign-pattern bucket meets
    # each delta posting through its representative only (at scale the
    # hot-bucket list is part of the persisted anchor/postings index).
    candidates = capped_probe_join_pairs(
        db, bb, ["table", "bucket"], "vec_new", "vec_base",
        "vec_new", "vec_base", DEFAULT_MAX_BUCKET_OCCUPANCY,
    )
    # Same per-row-norm verification as lsh_near_dup_pairs (r13).
    en = delta.select(
        F.col("vec_id").alias("vec_new"),
        F.col("embedding").alias("_en"),
        norm(F.col("embedding")).alias("_nn"),
    )
    eb = base.select(
        F.col("vec_id").alias("vec_base"),
        F.col("embedding").alias("_eb"),
        norm(F.col("embedding")).alias("_nb"),
    )
    sim = dot(_to_double(F.col("_en")), _to_double(F.col("_eb"))) / (
        F.col("_nn") * F.col("_nb")
    )
    return (
        candidates.join(en, "vec_new")
        .join(eb, "vec_base")
        .select("vec_new", "vec_base", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def rp_sign_matrix(d_in: int, d_out: int) -> list[list[float]]:
    """Deterministic ±1 projection matrix: sign(i, j) from the top bit of
    md5(f"{i}:{j}") — reproducible in any engine/language, no RNG state.
    Column-major: ``matrix[j][i]`` is input-dim i's sign for output-dim j."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[0], 16) < 8
            else -1.0
            for i in range(d_in)
        ]
        for j in range(d_out)
    ]


def random_projection(
    embeddings: DataFrame,
    d_in: int,
    d_out: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction with a signed
    (Achlioptas-style ±1) matrix: ``y_j = (1/√d_out) · Σ_i v_i·s(i,j)``.
    The matrix is driver-generated literals folded into the projection —
    a pure scan+project with ZERO shuffles, the same serving shape as
    ``kmeans_assign_precomputed``. Use it to shrink vectors before
    LSH/ANN/near-dup when the raw dimensionality dominates compute.

    Determinism: signs from md5 (engine-replayable), per-output-dim
    left-to-right dot folds, and a scale of 1/√d_out — exactly
    representable when ``d_out`` is a power of 4 (16 → 0.25); other
    values still replay (IEEE sqrt is correctly rounded) but prefer
    powers of 4 for clarity. Returns ``(id, proj array<double>)``."""
    signs = rp_sign_matrix(d_in, d_out)
    import math

    scale = 1.0 / math.sqrt(float(d_out))
    v = _to_double(F.col(vec_col))
    proj = F.array(
        *[
            dot(v, F.array(*[F.lit(s) for s in signs[j]])) * F.lit(scale)
            for j in range(d_out)
        ]
    )
    return fan_out(embeddings).select(
        F.col(id_col), proj.alias("proj")
    )
