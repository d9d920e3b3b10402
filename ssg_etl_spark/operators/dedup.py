"""Deduplication operators for training-data pipelines: exact, n-gram
Jaccard, MinHash+LSH, SimHash (BASELINE.json north-star extensions).

Scale design:
* Exact dedup — hash-groupBy on a content digest; one shuffle on the digest.
* N-gram Jaccard — exact pairwise similarity via a shingle self-join;
  quadratic in cluster size, linear in corpus (only docs sharing a shingle
  ever meet). The candidate join is the shuffle; shingle sets are distinct'd
  first to bound fanout.
* MinHash+LSH — the 100 TB path: k hash functions → per-doc signature →
  banded bucket join → candidates → exact-Jaccard verification. Only
  bucket-colliding pairs are verified, so cost ~ O(corpus + candidates).
* SimHash — 64-bit signatures from word hashes; near-dup = small Hamming
  distance; banded by signature bytes for candidate generation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ssg_etl_spark.cache import persist_tracked
from ssg_etl_spark.operators.lsh import (
    DEFAULT_MAX_BUCKET_OCCUPANCY,
    band_buckets,
    capped_probe_join_pairs,
    capped_self_join_pairs,
    hot_bucket_list,
    minhash_signature,
)
from ssg_etl_spark.operators.text import normalize_text, word_shingles
from ssg_etl_spark.partitioning import fan_out

# Shingles present in more documents than this are dropped before any
# shingle-equality self-join. A ubiquitous shingle (a stopword trigram on a
# web-scale corpus) shared by 10^6 docs would otherwise create a 10^12-row
# candidate hotspot in one join key. Dropping it from the shingle UNIVERSE
# (sizes and intersections both) keeps Jaccard internally consistent: the
# similarity is computed over the discriminative-shingle space. 1000 keeps
# the worst per-shingle fanout at ~500k pairs per key — executor-sized.
DEFAULT_MAX_SHINGLE_DF = 1000


def _cap_shingle_df(shingles: DataFrame, max_df: int | None) -> DataFrame:
    """Drop shingles whose document frequency exceeds ``max_df``.

    The hot-shingle list is corpus-size/max_df at worst, so AQE broadcasts
    the anti-join side in practice; the df aggregation shuffles on the same
    key the downstream self-join would, and removes its skew.
    """
    if max_df is None:
        return shingles
    hot = (
        shingles.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") > max_df)
        .select("shingle")
    )
    return shingles.join(hot, "shingle", "left_anti")


def exact_dedup_groups(documents: DataFrame) -> DataFrame:
    """Exact duplicate grouping on normalized-content digest.

    Returns one row per distinct content: canonical (min) doc_id, the
    digest, and the duplicate count. `md5(text)` matches DuckDB's md5 for
    oracle parity; at scale swap for xxhash64 (cheaper, same plan).
    """
    norm = normalize_text(F.col("text"))
    return (
        fan_out(documents)
        .select(
            F.col("doc_id"), F.md5(norm.cast("binary")).alias("content_hash")
        )
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_duplicates"),
        )
    )


def incremental_exact_dedup(
    base_index: DataFrame, delta: DataFrame
) -> DataFrame:
    """Delta-vs-corpus EXACT dedup: classify each delta document as new
    content or a duplicate of existing corpus content by digest lookup
    against a precomputed digest index (:func:`exact_dedup_groups` output
    — build once, parquet it, probe per batch, the same amortization
    contract as :func:`build_minhash_index`).

    Returns (doc_id, content_hash, is_duplicate, canonical_doc_id):
    duplicates carry the corpus canonical, new content carries NULL.
    Within-delta duplicates are the batch's own
    :func:`exact_dedup_groups` pass, not this probe's job.

    100 TB shape: one hash join keyed on the digest — no shingling, no
    bands. The index side is corpus-sized, the delta batch small, and the
    probe key is the scanned index column: exactly the shape Spark's
    runtime bloom-filter injection
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``, on by default)
    optimizes. The optimizer builds a bloom from the delta's digests and
    plants ``might_contain`` on the index scan, so index rows that cannot
    match any delta digest drop at the scan and never enter the shuffle —
    the classic membership prefilter for incremental dedup, injected by
    Catalyst instead of hand-built. Pinned by a plan test with the
    injection size thresholds scaled down to fixture size; at corpus
    scale the default 10 GB application-side threshold is what a real
    index scan exceeds.
    """
    # NO fan_out here: the delta is the bloom-CREATION side, and fan_out's
    # Repartition (triggered by exactly the small few-split delta files
    # production ships) breaks the key-lineage trace InjectRuntimeFilter
    # needs — disabling the optimization this operator exists to exploit.
    # The delta-side work is one md5 per row; scan parallelism is enough.
    d = delta.select(
        "doc_id",
        F.md5(normalize_text(F.col("text")).cast("binary")).alias(
            "content_hash"
        ),
    )
    idx = base_index.select("content_hash", "canonical_doc_id")
    return d.join(idx, "content_hash", "left").select(
        "doc_id",
        "content_hash",
        F.col("canonical_doc_id").isNotNull().alias("is_duplicate"),
        "canonical_doc_id",
    )


def _shingle_jaccard(shingles: DataFrame, threshold: float) -> DataFrame:
    """Exact Jaccard over DISTINCT shingle sets: |∩| via self-join on
    shingle, |∪| = |A|+|B|-|∩|. Callers pass a df-capped shingle set
    (see :func:`_cap_shingle_df`) so the equality self-join has no hot
    keys; sizes and intersections both use the same capped universe."""
    # Persisted (r13): both join sides (sa, sb) consume the size table;
    # unpersisted, the shingle-stream aggregation ran once per side.
    # Doc-count-sized rows of (id, long) — bounded at any corpus scale.
    sizes = persist_tracked(
        shingles.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    )
    a = shingles.alias("a")
    b = shingles.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jacc = (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_common").cast("double")
                / (F.col("sa.n_shingles") + F.col("sb.n_shingles") - F.col("n_common")).cast("double")
            ).alias("jaccard"),
        )
    )
    return jacc.filter(F.col("jaccard") >= threshold)


def _pair_jaccard(
    pairs: DataFrame,
    shingles: DataFrame,
    threshold: float,
    left: str = "doc_a",
    right: str = "doc_b",
) -> DataFrame:
    """Exact Jaccard for EXACTLY the candidate pairs (r14): per-doc shingle
    ARRAYS + ``array_intersect`` instead of a shingle-level self-join.

    :func:`_shingle_jaccard` pairs ALL candidate docs sharing a shingle —
    a superset of the candidate pairs that the callers then semi-join away
    — and costs two full exchanges of the candidate shingle stream (both
    self-join sides), a per-pair groupBy, a separate sizes aggregation and
    two join-backs. Driving verification from the pair table computes one
    ``|A∩B|`` per candidate pair: one groupBy of the candidate shingle
    stream into per-doc arrays, two equi-joins to attach them, and a
    codegen'd ``array_intersect`` per pair. The candidate generators emit
    per-doc-DISTINCT shingles (``word_shingles`` array_distinct + the df
    cap), so ``size(array_intersect)`` equals the self-join's match count
    and ``J = |∩| / (|A|+|B|-|∩|)`` is the identical double.

    Scale shape: the heavy stream crosses the network once (the array
    groupBy) instead of twice, pair cost tracks the CANDIDATE count (not
    the co-shingle superset), and per-doc arrays are bounded by document
    length — the occupancy/df guards upstream keep per-doc pair fan-out
    bounded exactly as before.
    """
    sets_ = shingles.groupBy("doc_id").agg(
        F.collect_list("shingle").alias("_sh")
    )
    a = sets_.select(
        F.col("doc_id").alias(left), F.col("_sh").alias("_sha")
    )
    b = sets_.select(
        F.col("doc_id").alias(right), F.col("_sh").alias("_shb")
    )
    paired = pairs.join(a, left).join(b, right)
    # Intermediate projection pins ONE evaluation of the intersection
    # (CollapseProject does not inline non-cheap expressions consumed
    # more than once — the jaccard expression reads _ni twice).
    withn = paired.select(
        left,
        right,
        F.size(F.array_intersect("_sha", "_shb")).alias("_ni"),
        F.size("_sha").alias("_na"),
        F.size("_shb").alias("_nb"),
    )
    jacc = withn.select(
        left,
        right,
        (
            F.col("_ni").cast("double")
            / (F.col("_na") + F.col("_nb") - F.col("_ni")).cast("double")
        ).alias("jaccard"),
    )
    return jacc.filter(F.col("jaccard") >= threshold)


def ngram_jaccard_pairs(
    documents: DataFrame,
    threshold: float = 0.5,
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
) -> DataFrame:
    """Exact 3-word-shingle Jaccard near-duplicate pairs (the small-scale
    baseline the approximate methods are verified against). Jaccard is over
    the df-capped shingle space (see :data:`DEFAULT_MAX_SHINGLE_DF`)."""
    # Persist the RAW shingles first: the df-cap plan consumes them twice
    # (hot-list aggregation + anti-join probe side), and the shingling
    # explode+distinct is the expensive part. The capped result is
    # persisted too — it feeds the size aggregation and both sides of the
    # intersection self-join. Tracked (ssg_etl_spark.cache): consumers call
    # release_tracked() after the query is consumed.
    raw = persist_tracked(word_shingles(documents))
    capped = persist_tracked(_cap_shingle_df(raw, max_shingle_df))
    return _shingle_jaccard(capped, threshold)


def ngram_jaccard_pairs_prefix(
    documents: DataFrame,
    threshold: float = 0.5,
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
) -> DataFrame:
    """Exact Jaccard pairs via PREFIX FILTERING — the same result set as
    :func:`ngram_jaccard_pairs`, found without joining on every shingle.

    The prefix-filter lemma (the classic set-similarity-join optimization
    — Chaudhuri/Ganti/Kaushik SSJoin, Xiao et al. PPJoin): sort each
    document's shingles by one GLOBAL total order and keep only the first
    ``|d| - ceil(t*|d|) + 1`` as its *prefix*. Any pair with
    ``J(A,B) >= t`` has overlap ``o >= t*max(|A|,|B|)`` (since the union
    is at least the larger set), so by pigeonhole the pair MUST share a
    token inside both prefixes — joining prefixes only is lossless.
    Ordering by ascending document frequency makes prefixes carry the
    RAREST shingles, so the candidate join's key-frequency distribution
    collapses: at threshold 0.5 the join touches ~half the tokens of each
    doc, and the quadratic hot-shingle blowup the df-cap guards against
    cannot arise from common tokens at all. Exact verification of the
    candidates then computes true Jaccard over the full capped universe —
    identical semantics, shared oracle.

    Scale shape: one extra df aggregation + one per-doc window (bounded by
    document length) versus a candidate join whose cost tracks the number
    of TRUE near-pairs, not the shingle-frequency distribution."""
    from pyspark.sql.window import Window

    raw = persist_tracked(word_shingles(documents))
    capped = persist_tracked(_cap_shingle_df(raw, max_shingle_df))

    # Document frequency via a window over the shingle partitioning (r13)
    # instead of groupBy + join-back: the join form exchanged the capped
    # stream twice by shingle (partial counts + probe side, ~4 MB each at
    # sf0.1). One window partition holds at most max_shingle_df rows (the
    # cap is exactly what bounds it), so the unordered count window is
    # skew-safe by construction. Same _df values, one exchange, no join.
    ranked = capped.withColumn(
        "_df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
    ).withColumn(
        "_rk",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy("_df", "shingle")
        ),
    )
    sized = ranked.withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
    )
    # prefix length = n - ceil(t*n) + 1. ceil(t*n) must be EXACT or the
    # prefix shrinks below the lemma's bound and drops qualifying pairs:
    # double math rounds up for many thresholds (0.07*100 →
    # 7.000000000000001, ceil 8). Derive t as an exact rational from its
    # decimal literal and compute ceil(n*num/den) = (n*num + den-1) div den
    # with a DECIMAL(38,0) product: a float-repr threshold like 1/3 has
    # den = 10^16, so the BIGINT product overflows (silently, ANSI off)
    # for documents past ~2.7k shingles — DECIMAL keeps the integral
    # `div` exact to n ~ 10^22 (r9 review finding).
    from fractions import Fraction

    frac = Fraction(str(threshold))
    num, den = frac.numerator, frac.denominator
    ceil_tn = F.expr(
        f"(CAST(_n AS DECIMAL(38,0)) * {num} + {den - 1}) div {den}"
    ).cast("int")
    prefix_len = F.col("_n") - ceil_tn + 1
    prefix = persist_tracked(
        sized.filter(F.col("_rk") <= prefix_len).select("doc_id", "shingle")
    )
    a = prefix.alias("a")
    b = prefix.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    candidates = persist_tracked(candidates)
    cand_docs = (
        candidates.select(F.col("doc_a").alias("doc_id"))
        .union(candidates.select("doc_b"))
        .distinct()
    )
    # Pair-driven verification (r14, _pair_jaccard): one consumer, so the
    # candidate shingle stream needs no persist — it flows straight into
    # the per-doc array groupBy.
    cand_shingles = capped.join(cand_docs, "doc_id", "left_semi")
    return _pair_jaccard(candidates, cand_shingles, threshold)


def minhash_lsh_pairs(
    documents: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 64,
    rows_per_band: int = 2,
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
    max_bucket_occupancy: int | None = DEFAULT_MAX_BUCKET_OCCUPANCY,
) -> DataFrame:
    """MinHash + banded LSH near-duplicate pairs with exact verification.

    Pipeline: shingle → one xxhash64 + k affine mixes (classic one-hash
    minwise construction, ``lsh.minhash_signature``) → per-doc
    min-signature → band buckets → occupancy-guarded bucket join
    (``lsh.capped_self_join_pairs``: oversized buckets emit star
    candidates, so a degenerate template family cannot go quadratic) →
    exact Jaccard on candidates → threshold filter. With 64 hashes in 32
    bands of 2 rows, P(miss) at s≥0.5 is (1-s²)^32 ≤ 1e-4 and ~1e-40 at
    the s≈0.98 of true near-dups, so the verified output equals the exact
    operator on all but adversarial inputs (and false positives are
    eliminated by verification).
    """
    # Shingling (split+explode+distinct, one shuffle) feeds three plan
    # branches (signatures, candidate sizes, candidate self-join); persist
    # so it computes once. MEMORY_AND_DISK + LRU eviction keeps this safe.
    # The df cap is applied to the FULL corpus before anything else, so the
    # signatures, the verification sizes, and the verification intersections
    # all see the same capped shingle universe (candidate-subset df would
    # drift from the exact operator's corpus-wide cap). Raw shingles are
    # persisted separately: the cap plan reads them twice (hot-list agg +
    # anti-join probe), and shingling is the expensive branch.
    raw = persist_tracked(word_shingles(documents))
    shingles = persist_tracked(_cap_shingle_df(raw, max_shingle_df))

    # One row per doc × 64 longs — |docs|-sized, not |shingles|-sized.
    # Persisted because the occupancy-guarded SELF-join consumes the bucket
    # explode several times, and without it the 64-way min-hash aggregation
    # recomputes per branch (measured 4×+ at sf0.1: 39 s → 13 s with the
    # persists here).
    sig = persist_tracked(minhash_signature(shingles, "doc_id", "shingle", num_hashes))
    # Persisted per capped_self_join_pairs' contract: the band explode is
    # consumed by the EAGER occupancy aggregation plus both self-join
    # sides — unpersisted it would recompute three times.
    buckets = persist_tracked(band_buckets(sig, "doc_id", num_hashes, rows_per_band))

    # Candidate pairs are near-dup-sized (small); persisted because both the
    # verification filter and the final semi-join consume them.
    candidates = persist_tracked(
        capped_self_join_pairs(
            buckets, ["band", "bucket"], "doc_id", "doc_a", "doc_b",
            max_bucket_occupancy,
        )
    )

    # Exact verification restricted to candidate docs only — pair-driven
    # (r14, _pair_jaccard): Jaccard is computed for exactly the candidate
    # pairs via per-doc arrays, not for every co-shingle pair among
    # candidate docs.
    cand_docs = (
        candidates.select(F.col("doc_a").alias("doc_id"))
        .union(candidates.select("doc_b"))
        .distinct()
    )
    cand_shingles = shingles.join(cand_docs, "doc_id", "left_semi")
    return _pair_jaccard(candidates, cand_shingles, threshold)


def minhash_lsh_pairs_incremental(
    base: DataFrame,
    delta: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 64,
    rows_per_band: int = 2,
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
    max_bucket_occupancy: int | None = DEFAULT_MAX_BUCKET_OCCUPANCY,
) -> DataFrame:
    """Dedup NEW documents against an EXISTING corpus — the operational
    shape of corpus growth: a daily crawl lands, and only new-vs-corpus
    near-dups matter. Returns (doc_new, doc_base, jaccard) with
    ``doc_new`` from ``delta`` and ``doc_base`` from ``base``.

    Same pipeline as :func:`minhash_lsh_pairs` (df-capped shingles over
    base ∪ delta → signatures → banded buckets → candidates → exact
    verification), with ONE structural change: the bucket join is
    delta×base instead of a full self-join, so the quadratic base×base
    term never exists. Cost ~ O(|base| + |delta| × bucket occupancy).
    At 100 TB the base signatures/buckets are a precomputed table keyed
    by (band, bucket); each batch computes delta signatures only and
    probes — this function expresses that plan shape over the raw
    inputs (it re-shingles the base every run), which makes it the
    SEMANTIC reference: the union-df cap is exact. The operational form
    is :func:`build_minhash_index` + :func:`minhash_lsh_pairs_vs_index`,
    which actually skips the base work (measured at sf0.1: probe 6.0 s
    vs 12.8 s for this form and 10.7 s for the full self-join run).
    The shingle df cap here is computed over the UNION, matching the
    full operator's corpus-wide cap semantics.
    """
    union = base.select("doc_id", "text").unionByName(
        delta.select("doc_id", "text")
    )
    raw = persist_tracked(word_shingles(union))
    shingles = persist_tracked(_cap_shingle_df(raw, max_shingle_df))

    sig = minhash_signature(shingles, "doc_id", "shingle", num_hashes)
    buckets = persist_tracked(
        band_buckets(sig, "doc_id", num_hashes, rows_per_band)
    )
    delta_ids = delta.select("doc_id").distinct()
    new_side = buckets.join(delta_ids, "doc_id", "left_semi")
    base_side = buckets.join(delta_ids, "doc_id", "left_anti")
    # Base-side occupancy guard (lsh.capped_probe_join_pairs): a
    # degenerate BASE bucket meets each delta posting through its
    # representative only, bounding the occupancy_base × occupancy_delta
    # term. Pair-driven verification (r14, _pair_jaccard) keys directly
    # on (doc_new, doc_base), so the (lo, hi) normalization and the
    # orientation-restore join of the _shingle_jaccard era are gone —
    # delta-first orientation flows straight through.
    candidates = persist_tracked(
        capped_probe_join_pairs(
            new_side, base_side, ["band", "bucket"], "doc_id", "doc_id",
            "doc_new", "doc_base", max_bucket_occupancy,
        )
    )
    cand_docs = (
        candidates.select(F.col("doc_new").alias("doc_id"))
        .union(candidates.select("doc_base"))
        .distinct()
    )
    cand_shingles = shingles.join(cand_docs, "doc_id", "left_semi")
    return _pair_jaccard(
        candidates, cand_shingles, threshold, left="doc_new", right="doc_base"
    )


def build_minhash_index(
    documents: DataFrame,
    num_hashes: int = 64,
    rows_per_band: int = 2,
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
    max_bucket_occupancy: int | None = DEFAULT_MAX_BUCKET_OCCUPANCY,
) -> dict[str, DataFrame]:
    """The PRECOMPUTED side of delta-vs-corpus dedup: builds the
    base-corpus tables a repeat run needs, so each batch pays only for its
    own documents (r4 verdict item 3 — without this, every incremental run
    re-shingled and re-signed the whole base and was slower than a full
    self-join run).

    Returns ``{"shingles", "buckets", "hot", "hot_buckets"}``:

    * ``shingles`` — df-capped (doc_id, shingle) postings, the verification
      side. At 100 TB this is the big table: write it partitioned/bucketed
      by shingle so the candidate semi-join co-locates.
    * ``buckets`` — (doc_id, band, bucket) LSH postings, the probe target;
      bucket by (band, bucket) on write and the delta probe join is
      shuffle-free on the base side.
    * ``hot`` — the capped-out shingle list (tiny), pinned so delta batches
      apply the SAME cap the index was built with.
    * ``hot_buckets`` — oversized (band, bucket) groups with their
      representative (``lsh.hot_bucket_list``): the probe's occupancy
      guard consumes this tiny table instead of re-aggregating the
      corpus postings per batch.

    The df cap is pinned at build time (base-only), the operational
    semantics of an incremental index: a shingle whose document frequency
    crosses the cap only via base+delta SUM is not retro-capped until the
    next index rebuild (bounded drift; rebuilds are the compaction story).
    """
    raw = persist_tracked(word_shingles(documents))
    if max_shingle_df is None:
        hot = raw.select("shingle").limit(0)
    else:
        hot = (
            raw.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_shingle_df)
            .select("shingle")
        )
    # Persisted (r13): when the index is consumed IN-PLAN (the registered
    # dedup_incremental_precomputed composition, rather than the
    # write-to-parquet bench form), `hot` feeds the delta cap AND this
    # anti-join, and `shingles` feeds the signature aggregation AND the
    # verification side — unpersisted, the base shingle scan re-ran per
    # consumer (three identical 3.5 MB-exchange stages in the metrics).
    # In the parquet form the persists are read once and released.
    hot = persist_tracked(hot)
    shingles = persist_tracked(raw.join(hot, "shingle", "left_anti"))
    sig = minhash_signature(shingles, "doc_id", "shingle", num_hashes)
    buckets = persist_tracked(
        band_buckets(sig, "doc_id", num_hashes, rows_per_band)
    )
    hot_buckets = hot_bucket_list(
        buckets, ["band", "bucket"], "doc_id", max_bucket_occupancy
    )
    return {
        "shingles": shingles,
        "buckets": buckets,
        "hot": hot,
        "hot_buckets": hot_buckets,
    }


def minhash_lsh_pairs_vs_index(
    base_shingles: DataFrame,
    base_buckets: DataFrame,
    base_hot: DataFrame,
    delta: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 64,
    rows_per_band: int = 2,
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
    base_hot_buckets: DataFrame | None = None,
) -> DataFrame:
    """Delta-vs-corpus near-dup pairs against a PRECOMPUTED base index
    (:func:`build_minhash_index`): the base corpus is never re-shingled or
    re-signed — per-batch cost is O(|delta| + candidates), which is what
    makes daily dedup against a 100 TB corpus affordable.

    Semantics match :func:`minhash_lsh_pairs_incremental` under the
    index's pinned cap: delta shingles drop if they are in the base hot
    list OR exceed the cap within the delta alone; the only divergence
    from the recompute form is a shingle whose df crosses the cap solely
    via the base+delta sum (retro-capped at the next index rebuild).
    ``tests/test_dedup.py`` pins output equality at fixture scale, where
    no shingle sits at the cap boundary. Returns (doc_new, doc_base,
    jaccard), delta-first like the recompute form.

    The index hash parameters (``num_hashes``, ``rows_per_band``) must
    match the build call — bucket ids are xxhash64 over them.
    ``base_hot_buckets`` is the index's precomputed oversized-bucket list
    (``build_minhash_index()["hot_buckets"]``): pass it so the occupancy
    guard never re-aggregates the corpus postings per batch; with None
    the probe runs unguarded (the pre-r6 behavior).
    """
    raw_delta = persist_tracked(word_shingles(delta))
    capped_delta = persist_tracked(
        _cap_shingle_df(raw_delta, max_shingle_df).join(
            base_hot, "shingle", "left_anti"
        )
    )
    sig = minhash_signature(capped_delta, "doc_id", "shingle", num_hashes)
    delta_buckets = band_buckets(sig, "doc_id", num_hashes, rows_per_band)
    candidates = persist_tracked(
        capped_probe_join_pairs(
            delta_buckets, base_buckets, ["band", "bucket"],
            "doc_id", "doc_id", "doc_new", "doc_base",
            max_occupancy=None, hot_buckets=base_hot_buckets,
        )
    )
    # Verification shingle sets: base side from the index (semi-joined to
    # candidate base docs), delta side from this batch. Pair-driven
    # verification (r14, _pair_jaccard) keys directly on
    # (doc_new, doc_base) over the union of both sides' capped universes —
    # the (lo, hi) normalization join of the _shingle_jaccard era is gone.
    base_cand = base_shingles.join(
        candidates.select(F.col("doc_base").alias("doc_id")).distinct(),
        "doc_id",
        "left_semi",
    )
    delta_cand = capped_delta.join(
        candidates.select(F.col("doc_new").alias("doc_id")).distinct(),
        "doc_id",
        "left_semi",
    )
    cand_shingles = base_cand.unionByName(delta_cand)
    return _pair_jaccard(
        candidates, cand_shingles, threshold, left="doc_new", right="doc_base"
    )


def ngram_contamination(
    corpus: DataFrame, benchmark: DataFrame, min_shared: int = 3
) -> DataFrame:
    """Benchmark-contamination detection: corpus documents sharing at least
    ``min_shared`` DISTINCT 3-word shingles with a benchmark document —
    the decontamination pass run before training so eval data does not
    leak into the corpus. Returns (doc_id, bench_id, n_shared) per
    contaminated (corpus doc, benchmark doc) pair.

    Unlike near-dup Jaccard this is an ABSOLUTE overlap count with no df
    cap: a single leaked benchmark sentence inside a long document is
    exactly what must be caught, and ubiquitous shingles are the
    benchmark's own problem (raise ``min_shared`` rather than silently
    dropping shingles). Benchmark suites are dimension-sized next to a
    training corpus, so the shingle join broadcasts the benchmark side;
    corpus-side work is one linear shingle pass.
    """
    c = word_shingles(corpus)
    b = word_shingles(benchmark).select(
        F.col("doc_id").alias("bench_id"), "shingle"
    )
    return (
        c.join(F.broadcast(b), "shingle")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def simhash_signatures(documents: DataFrame, bits: int = 60) -> DataFrame:
    """Per-document SimHash: sign of the per-bit sum of shingle-hash bits.

    3-word shingles (same unit as MinHash — single words are not
    discriminative when the corpus shares a vocabulary) → 60-bit
    md5-derived hash per shingle → per-bit ±1 votes → sign vector packed
    into a long. JVM-side via explode over bit positions.

    The shingle hash is the first 15 hex chars of md5 (60 bits): md5 is
    engine-portable (DuckDB computes the identical digest), and 60 bits fit
    a signed BIGINT in both engines without overflow games — which makes
    the whole signature + Hamming pipeline SQL-expressible for the oracle.
    xxhash64 would be cheaper per shingle at 100 TB, but the signature cost
    is dominated by the shuffle, not the hash.
    """
    shingles = word_shingles(documents).withColumnRenamed("shingle", "w")
    hashed = shingles.select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("w").cast("binary")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    # One aggregation with `bits` one-bit counters instead of exploding
    # `bits` rows per shingle: the ±1 vote sum for bit b is
    # 2·ones_b − n_shingles, so sign(v_b) > 0 ⟺ 2·ones_b > n. Map-side
    # partial aggregation collapses each partition to one row per doc —
    # the explode form shuffled 60× the shingle count (measured 17 s → 3 s
    # at sf0.1).
    counts = hashed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))).alias(f"_o{b}")
            for b in range(bits)
        ],
    )
    packed = None
    for b in range(bits):
        term = F.when(
            F.col(f"_o{b}") * 2 > F.col("_n"), F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        packed = term if packed is None else packed + term
    return counts.select("doc_id", packed.alias("simhash"))


def simhash_pairs(
    documents: DataFrame,
    bits: int = 60,
    max_hamming: int = 7,
    max_bucket_occupancy: int | None = DEFAULT_MAX_BUCKET_OCCUPANCY,
    n_bands: int = 8,
) -> DataFrame:
    """SimHash near-duplicate pairs: Hamming(simhash_a, simhash_b) ≤ k.

    Candidate generation is banded (8 equal chunks of the signature → docs
    sharing any chunk meet); with k ≤ 7 differing bits over 8 bands,
    pigeonhole guarantees every qualifying pair shares at least one exact
    band. With 60-bit signatures the bands cover bits 0..55; the uncovered
    top bits can only ADD candidates (two docs differing solely there
    still share all 8 bands), and membership is decided by the exact
    Hamming filter over the full signature.

    The band self-join is occupancy-guarded
    (``lsh.capped_self_join_pairs``): an oversized (band, chunk) bucket
    emits star candidates around its min doc instead of all pairs,
    bounding the one quadratic term. RECALL BOUNDARY, stated honestly:
    once the guard fires, the pigeonhole guarantee narrows to pairs with
    at least one NON-oversized shared band (or a member within Hamming k
    of the bucket rep). Each band has only 2^(60/8)≈128 chunk values, so
    on a DIVERSE corpus ≫ 128·cap per partition, most buckets go hot with
    mostly-unrelated members and banded SimHash stops being a useful
    filter at all — that is a parameterization limit of the chosen
    band width, not of the guard (which merely converts the quadratic
    blowup into bounded work). The scale lever is ``n_bands``: FEWER
    bands ⇒ wider chunks ⇒ 2^(bits/n_bands) bucket values per band ⇒ a
    corpus ~2^(bits/n_bands)·cap is served — at the price of a tighter
    guaranteed radius (pigeonhole needs ``max_hamming < n_bands``). E.g.
    4 bands of 15 bits serve ~32k·cap docs at guaranteed hd ≤ 3; the
    8-band default serves ~128·cap at hd ≤ 7. Beyond what any banding
    covers, shard the corpus before banding or use MinHash (64-bit band
    buckets, where a hot bucket really is one duplicate family and the
    star contract stays semantically right).
    """
    # Persisted: the banded candidate generation SELF-joins the signature
    # table; without caching the two-aggregation signature plan runs twice.
    sig = persist_tracked(simhash_signatures(documents, bits))
    # Pigeonhole: k differing bits can ruin at most k bands, so a shared
    # band is guaranteed only while max_hamming < n_bands.
    assert 2 <= n_bands <= bits, "need 2 <= n_bands <= bits"
    assert max_hamming < n_bands, (
        "banded recall guarantee requires max_hamming < n_bands"
    )
    band_bits = bits // n_bands
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), b * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                        .alias("chunk"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.chunk").alias("chunk"))

    # Persisted per capped_self_join_pairs' contract (eager occupancy agg
    # + both self-join sides consume the 8-band explode).
    bands = persist_tracked(bands)
    cand = capped_self_join_pairs(
        bands, ["band", "chunk"], "doc_id", "doc_a", "doc_b", max_bucket_occupancy
    )
    # Signatures re-join on the candidate ids (docs-sized persisted table;
    # candidates are near-dup-sized) rather than riding the 8×-exploded
    # band shuffle.
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sig_b"))
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def duplicate_clusters(pairs: DataFrame, max_iters: int = 30) -> DataFrame:
    """Connected components over near-duplicate pairs: every document gets
    the MINIMUM doc id reachable through the pair graph as its cluster id
    (the canonical representative) — the standard final step of corpus
    dedup, turning pairwise evidence into keep/drop groups.

    Min-label propagation WITH pointer jumping: each round a node takes
    (1) the minimum label among its neighbors (propagate one hop), then
    (2) the label of its own label-node (shortcut: label ← label(label),
    the pointer-doubling step). Step 2 roughly doubles the distance a
    minimum has traveled per round, so convergence is O(log diameter)
    rounds instead of O(diameter) — a million-hop near-dup chain
    (templated spam, versioned boilerplate) converges in ~20 rounds. The
    fixpoint is the same either way: at fixpoint every edge carries equal
    labels, so each component is uniformly labeled with its minimum id.
    Labels only ever move to ids of nodes inside the same component
    (initial labels are self; both steps read labels of same-component
    nodes), so the shortcut cannot leak labels across components.

    Per round: two joins + one aggregation, all on the node key; the only
    driver-side value is the per-round change count. If the fixpoint is
    NOT reached within ``max_iters`` rounds this raises rather than
    returning partial labels — silently splitting one component into two
    clusters is a wrong answer, not a degraded one. The default (30)
    covers graphs of diameter ~2^30 under doubling; hitting it means
    something is structurally wrong with the input.

    Only documents that appear in at least one pair are returned
    (singletons are their own cluster by definition — joining them in
    would just echo the corpus).
    """
    # localCheckpoint (eager) rather than persist: iterative plans grow a
    # new join layer per round, and without lineage TRUNCATION Catalyst
    # re-analyzes an exponentially deepening tree — the classic iterative-
    # algorithm failure mode. Checkpointed labels restart the lineage each
    # round at the materialized blocks.
    #
    # Symmetrization is a per-row explode, NOT a union of two scans of
    # ``pairs`` (r13): the union form evaluated the whole upstream pair
    # pipeline twice (the two branches differ by a projection, so Spark's
    # exchange reuse cannot deduplicate them) — stage metrics on
    # dedup_clusters showed every verification stage doubled. One explode
    # emits both orientations from a single evaluation; the distinct and
    # everything downstream are unchanged.
    # Checkpoints are LAZY (r13): eager localCheckpoint runs a dedicated
    # materialization job per call, so every pointer-jumping round paid
    # TWO sequential driver jobs (checkpoint + convergence count) and the
    # sym/labels bootstrap paid two more — at fixture scale the rounds
    # are latency-bound, not compute-bound (56-stage queries whose stage
    # CPU sums to a fraction of the wall). The convergence count now
    # materializes each round's checkpoint as a side effect (count scans
    # every partition), and the changed-row test reads an _old column
    # carried through the round instead of re-joining the previous
    # labels: ONE job per round, same fixpoint test, same labels.
    sym = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
                    ),
                    F.struct(
                        F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
                    ),
                )
            ).alias("_e")
        )
        .select(F.col("_e.src").alias("src"), F.col("_e.dst").alias("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=False)
    )
    converged = False
    for _ in range(max_iters):
        nbr = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        hop = (
            labels.join(nbr, labels.node == nbr.src, "left")
            .select(
                labels.node,
                F.least(
                    labels.label, F.coalesce(nbr.nbr_label, labels.label)
                ).alias("label"),
                labels.label.alias("_old"),
            )
        )
        # Pointer jump: label ← min(label, hop-label of the label node).
        # Self-join of the hop labels on label == node; a label always IS a
        # node of the graph (labels start as self and only copy other
        # nodes' labels), so the left join misses only when... never — but
        # coalesce keeps the expression total anyway.
        parent = hop.select(
            F.col("node").alias("p_node"), F.col("label").alias("p_label")
        )
        new_labels = (
            hop.join(parent, hop.label == F.col("p_node"), "left")
            .select(
                hop.node,
                F.least(hop.label, F.coalesce(F.col("p_label"), hop.label)).alias(
                    "label"
                ),
                F.col("_old"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.filter(F.col("label") != F.col("_old")).count()
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"duplicate_clusters did not converge within {max_iters} rounds; "
            "returning partial labels would split components into distinct "
            "cluster ids. With pointer jumping this bound covers diameters "
            "~2^max_iters — inspect the pair graph before raising max_iters."
        )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def chunk_dedup_stats(documents: DataFrame, chunk_words: int = 16) -> DataFrame:
    """Sub-document (span-level) duplication profile: per document, the
    fraction of fixed-width word chunks whose exact content also appears in
    at least one OTHER document. Whole-document dedup misses boilerplate —
    headers, license blocks, navigation text — welded onto otherwise-unique
    pages; span-level exact dedup is the standard curation answer
    (cf. "Deduplicating Training Data Makes Language Models Better",
    Lee et al. 2022, which dedups at substring granularity).

    Scale shape: chunk explode is linear in corpus words; one shuffle on
    the chunk digest for the occurrence count (map-side combinable); the
    digest→count join back is AQE-decided; one per-doc aggregation. No
    pairwise term anywhere — cost O(total chunks), independent of how many
    documents share a chunk.
    """
    from ssg_etl_spark.operators.text import chunk_documents

    chunks = chunk_documents(documents, chunk_words=chunk_words, overlap_words=0)
    # Persisted: both the occurrence count and the join-back consume the
    # hashed chunks — without it each branch re-scans and re-explodes the
    # corpus (2 scans at 100 TB for one logical pass).
    hashed = persist_tracked(
        chunks.select(
            "doc_id", F.md5(F.col("chunk_text").cast("binary")).alias("chunk_hash")
        )
    )
    occ = hashed.groupBy("chunk_hash").agg(
        F.countDistinct("doc_id").alias("_n_docs")
    )
    return (
        hashed.join(occ, "chunk_hash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(
                F.when(F.col("_n_docs") >= 2, F.lit(1)).otherwise(F.lit(0))
            ).alias("n_shared_chunks"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_shared_chunks",
            F.round(
                F.col("n_shared_chunks") / F.col("n_chunks").cast("double"), 6
            ).alias("shared_chunk_frac"),
        )
    )


def boilerplate_chunks(
    documents: DataFrame,
    chunk_words: int = 16,
    min_docs: int = 2,
    k: int = 20,
) -> DataFrame:
    """The C4-style boilerplate list: the top-k exact chunks that recur
    across the most documents (then by total occurrences, then by digest
    for a total order). Feeding this list back as a removal filter is the
    classic "drop any line occurring ≥N times in the corpus" curation rule.

    One digest aggregation + TakeOrderedAndProject — the top-k never
    materializes a global sort.
    """
    from ssg_etl_spark.operators.text import chunk_documents

    chunks = chunk_documents(documents, chunk_words=chunk_words, overlap_words=0)
    return (
        chunks.select(
            "doc_id",
            "chunk_text",
            F.md5(F.col("chunk_text").cast("binary")).alias("chunk_hash"),
        )
        .groupBy("chunk_hash")
        .agg(
            # same digest ⇒ same text (md5 over the exact bytes), so min()
            # is just "the" text — it exists only to satisfy the aggregation
            F.min("chunk_text").alias("chunk_text"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .orderBy(
            F.desc("n_docs"), F.desc("n_occurrences"), F.asc("chunk_hash")
        )
        .limit(k)
    )


def chunk_keep_list(documents: DataFrame, chunk_words: int = 16) -> DataFrame:
    """Span-level keep/drop: every chunk occurrence except the canonical
    first one (min (doc_id, chunk_id) per digest) is marked for removal —
    exact-substring dedup semantics (keep one copy of every repeated span,
    wherever it appears).

    Canonicals come from a min-struct aggregation + digest join, NOT a
    row_number window over the digest: a mega-boilerplate chunk present in
    10^6 documents would put 10^6 rows in one window partition, while the
    aggregation form stays skew-immune via map-side partial min.
    """
    from ssg_etl_spark.operators.text import chunk_documents

    chunks = chunk_documents(documents, chunk_words=chunk_words, overlap_words=0)
    # Persisted: the canonical-min aggregation and the join-back both read
    # the hashed chunks; without it the corpus is scanned+exploded twice.
    hashed = persist_tracked(
        chunks.select(
            "doc_id",
            "chunk_id",
            "chunk_text",
            F.md5(F.col("chunk_text").cast("binary")).alias("chunk_hash"),
        )
    )
    canon = hashed.groupBy("chunk_hash").agg(
        F.min(F.struct("doc_id", "chunk_id")).alias("_canon"),
        F.count(F.lit(1)).alias("n_occurrences"),
    )
    return hashed.join(canon, "chunk_hash").select(
        "doc_id",
        "chunk_id",
        "chunk_hash",
        "n_occurrences",
        (
            (F.col("doc_id") == F.col("_canon.doc_id"))
            & (F.col("chunk_id") == F.col("_canon.chunk_id"))
        ).alias("keep"),
        "chunk_text",
    )


def span_deduped_corpus(documents: DataFrame, chunk_words: int = 16) -> DataFrame:
    """The span-dedup end deliverable: per-document text reassembled from
    only the KEPT chunks of ``chunk_keep_list`` — repeated spans survive
    exactly once corpus-wide, in their first occurrence. Documents made of
    nothing but repeats come back with empty text (n_kept = 0), the signal
    to drop them outright.

    Reassembly is a per-doc aggregation over sort_array(collect_list(
    struct(chunk_id, text))) — chunk counts per document are bounded by
    document length, so the collected list is row-sized, never corpus-sized.
    """
    kept = chunk_keep_list(documents, chunk_words=chunk_words)
    per_doc = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            F.col("keep"),
                            F.struct("chunk_id", "chunk_text"),
                        )
                    )
                ),
                lambda s: s.chunk_text,
            ),
            " ",
        ).alias("clean_text"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(F.col("keep"), 0).otherwise(1)).alias("n_dropped"),
    )
    return per_doc.select("doc_id", "clean_text", "n_kept", "n_dropped")


def build_chunk_index(documents: DataFrame, chunk_words: int = 16) -> DataFrame:
    """Chunk-digest index of a base corpus: one row per distinct 16-word
    span digest with its canonical first occurrence and occurrence count —
    the persisted table an incremental span-dedup probes (and the span
    twin of ``build_minhash_index``). Write it bucketed on ``chunk_hash``
    and the per-batch probe join is shuffle-free on the index side.
    """
    from ssg_etl_spark.operators.text import chunk_documents

    chunks = chunk_documents(documents, chunk_words=chunk_words, overlap_words=0)
    return (
        chunks.select(
            "doc_id",
            "chunk_id",
            F.md5(F.col("chunk_text").cast("binary")).alias("chunk_hash"),
        )
        .groupBy("chunk_hash")
        .agg(
            F.min(F.struct("doc_id", "chunk_id")).alias("_c"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .select(
            "chunk_hash",
            F.col("_c.doc_id").alias("canon_doc_id"),
            F.col("_c.chunk_id").alias("canon_chunk_id"),
            "n_occurrences",
        )
    )


def chunk_keep_list_vs_index(
    delta_documents: DataFrame, chunk_index: DataFrame, chunk_words: int = 16
) -> DataFrame:
    """Span-dedup a delta batch against a precomputed base chunk index
    WITHOUT re-chunking the base: a delta occurrence keeps only if its
    digest is absent from the base (the base already holds the canonical
    copy) and it is the first occurrence within the delta. Per-batch cost
    O(|delta chunks| + probe join); the base corpus is never re-read.

    First-seen-wins canonical semantics (the operational contract of an
    incremental index): a digest already in the base keeps its base
    canonical even if a delta doc_id sorts lower — a from-scratch
    ``chunk_keep_list`` over base ∪ delta would pick the global min
    instead. Batch-order dependence is inherent to every incremental
    dedup; rebuild the index to re-canonicalize.
    """
    from ssg_etl_spark.operators.text import chunk_documents

    chunks = chunk_documents(
        delta_documents, chunk_words=chunk_words, overlap_words=0
    )
    hashed = persist_tracked(
        chunks.select(
            "doc_id",
            "chunk_id",
            F.md5(F.col("chunk_text").cast("binary")).alias("chunk_hash"),
        )
    )
    canon = hashed.groupBy("chunk_hash").agg(
        F.min(F.struct("doc_id", "chunk_id")).alias("_c")
    )
    idx = chunk_index.select("chunk_hash", F.lit(True).alias("_in_base"))
    return (
        hashed.join(canon, "chunk_hash")
        .join(idx, "chunk_hash", "left")
        .select(
            "doc_id",
            "chunk_id",
            "chunk_hash",
            F.coalesce(F.col("_in_base"), F.lit(False)).alias("in_base"),
            (
                F.col("_in_base").isNull()
                & (F.col("doc_id") == F.col("_c.doc_id"))
                & (F.col("chunk_id") == F.col("_c.chunk_id"))
            ).alias("keep"),
        )
    )


def merge_chunk_index(
    chunk_index: DataFrame, delta_documents: DataFrame, chunk_words: int = 16
) -> DataFrame:
    """Fold a delta batch into the chunk index: existing digests keep
    their base canonical and add the delta occurrences to the count; new
    digests enter with their within-delta canonical. The index stays one
    row per digest, so repeated merges are idempotent in shape and the
    probe path never degrades.
    """
    delta_idx = build_chunk_index(delta_documents, chunk_words=chunk_words)
    merged = chunk_index.select(
        "chunk_hash",
        "canon_doc_id",
        "canon_chunk_id",
        "n_occurrences",
        F.lit(0).alias("_src"),
    ).unionByName(
        delta_idx.select(
            "chunk_hash",
            "canon_doc_id",
            "canon_chunk_id",
            "n_occurrences",
            F.lit(1).alias("_src"),
        )
    )
    # min struct(_src, canon…) — base (src 0) wins over delta (src 1)
    return (
        merged.groupBy("chunk_hash")
        .agg(
            F.min(
                F.struct("_src", "canon_doc_id", "canon_chunk_id")
            ).alias("_c"),
            F.sum("n_occurrences").alias("n_occurrences"),
        )
        .select(
            "chunk_hash",
            F.col("_c.canon_doc_id").alias("canon_doc_id"),
            F.col("_c.canon_chunk_id").alias("canon_chunk_id"),
            "n_occurrences",
        )
    )


# ----------------------------------------------------------------- SemDeDup


def semdedup_flags(
    embeddings: DataFrame,
    k: int = 4,
    n_iter: int = 3,
    tau: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster_size: int | None = 100_000,
) -> DataFrame:
    """Semantic deduplication via cluster-scoped cosine pruning — SemDeDup
    (Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
    semantic deduplication", arXiv:2303.09540): k-means partitions the
    embedding space, then near-duplicate detection runs ONLY inside each
    cluster, never across the corpus. Complexity is Σ|cluster|² instead of
    N² — at 100 TB, k is chosen so the expected cluster size is bounded
    (k ~ N / target_size), making the pairwise stage ~linear in N while
    the clustering stage stays one k-row sufficient-stat shuffle per
    Lloyd iteration (operators/clustering.py). This complements the LSH
    near-dup (`embedding_near_dup`): LSH buckets by random hyperplane
    signs and can miss moderate-similarity pairs; SemDeDup buckets by
    LEARNED semantic regions, the published choice for diversity pruning
    of web-scale training corpora (τ tuned to the target keep fraction —
    aggressive low-τ settings prune merely-similar points, not only
    verbatim near-dups).

    Keep rule (deterministic, EXISTS-replayable): cluster members are
    ranked by (d2 to final centroid, id) — centroid-nearest first; a
    member is dropped iff some EARLIER-ranked member has cosine >= tau
    with it. One row per input vector:
    ``(id_col, cluster_id int, is_kept boolean)``.

    ``max_cluster_size`` ENFORCES the Σ|cluster|² bound the k ~ N /
    target_size lever promises: the within-cluster stage is quadratic
    in the largest cluster, so a collapsed clustering (duplicate-heavy
    or zero-ish embeddings piling into one centroid) would silently go
    N² without it. The check is a k-row aggregate over the assignment
    (cluster sizes), collected before any pairwise work; a violation
    raises with the measured sizes — the same raise-don't-melt
    convention as ``quantiles_exact_grouped``'s ``max_groups``
    (analytics.py). Pass ``None`` only when the caller enforces the
    bound elsewhere.
    """
    from ssg_etl_spark.operators.clustering import kmeans_assign
    from ssg_etl_spark.operators.similarity import _to_double, dot
    from pyspark.sql import Window

    assigned = kmeans_assign(embeddings, k, n_iter, id_col, vec_col)
    if max_cluster_size is not None:
        assigned = persist_tracked(assigned)
        sizes = (
            assigned.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("_n"))
            .collect()
        )
        worst = max((r["_n"] for r in sizes), default=0)
        if worst > max_cluster_size:
            raise ValueError(
                f"largest cluster holds {worst} members, over "
                f"max_cluster_size={max_cluster_size}: the pairwise stage "
                f"would be ~{worst}² comparisons. Raise k (choose k "
                "~ N / target_size so expected cluster size stays "
                "bounded), or raise max_cluster_size deliberately"
            )
    vecs = embeddings.select(
        F.col(id_col), _to_double(F.col(vec_col)).alias("_v")
    )
    rk = F.row_number().over(
        Window.partitionBy("cluster_id").orderBy("d2", id_col)
    )
    members = persist_tracked(
        assigned.join(vecs, id_col)
        .withColumn("_rk", rk)
        .withColumn("_n", F.sqrt(dot(F.col("_v"), F.col("_v"))))
    )
    # Slice the within-cluster pairwise join (r13): joining on cluster_id
    # alone exchanges into only k distinct keys, so at small k the whole
    # Σ|cluster|² cosine stage runs on k of the session's cores (measured
    # at sf0.1/k=4: ~6 s of executorCpuTime serialized onto 4 tasks —
    # the dominant semdedup stage). Each earlier-ranked row is replicated
    # into S deterministic slices and each later-ranked row lands in
    # exactly one (its rank mod S), so every (earlier, later) pair is
    # produced exactly once and the SAME pair set spreads over k×S keys.
    # S scales inversely with k — at corpus scale k ~ N/target_size is
    # large, S collapses to 1, and the plan is unchanged (the replication
    # never multiplies a big-k join).
    n_slices = max(1, -(-members.sparkSession.sparkContext.defaultParallelism // max(1, int(k))))
    a = members.select(
        F.col("cluster_id"),
        F.col("_rk").alias("_rk_a"),
        F.col("_v").alias("_va"),
        F.col("_n").alias("_na"),
        F.explode(
            F.sequence(F.lit(0), F.lit(int(n_slices) - 1))
        ).alias("_sl"),
    )
    b = members.select(
        F.col("cluster_id"),
        F.col(id_col),
        F.col("_rk").alias("_rk_b"),
        F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"),
        F.pmod(F.col("_rk"), F.lit(int(n_slices))).alias("_sl"),
    )
    cos = dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    # Zero-norm vectors cannot be dup sources/targets (cosine undefined;
    # NaN ordering differs across engines) but still appear in the output.
    dup_ids = (
        a.join(b, ["cluster_id", "_sl"])
        .filter(F.col("_rk_a") < F.col("_rk_b"))
        .filter((F.col("_na") > 0) & (F.col("_nb") > 0))
        .filter(cos >= F.lit(tau))
        .select(id_col)
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    return (
        members.join(dup_ids, id_col, "left")
        .select(
            id_col,
            "cluster_id",
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("is_kept"),
        )
    )
