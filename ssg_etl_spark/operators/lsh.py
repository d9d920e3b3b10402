"""Shared LSH plumbing: minwise hash-family construction and the
occupancy-guarded banded self-join used by every bucketed candidate
generator (MinHash bands, SimHash chunks, sign-pattern tables).

Scale rationale for the occupancy guard: a banded candidate self-join costs
O(Σ occupancy²) over its (band, bucket) groups. One degenerate bucket — a
template-page family of 10⁶ near-identical documents, or a dense embedding
cluster sharing a sign pattern — is quadratic in that bucket and lands on a
single reducer; AQE skew-split can move the rows but cannot shrink the
candidate count. The guard caps the all-pairs expansion per bucket and
replaces oversized buckets with STAR candidates around the bucket's minimum
id: candidate count becomes O(occupancy), connectivity within the bucket is
preserved exactly (every member still meets the representative, so
connected-components clustering over verified pairs is unchanged for
bucket-wide duplicate families), and downstream exact verification still
eliminates all false positives. The only semantic delta, mirrored from the
shingle df-cap contract (`dedup._cap_shingle_df`): a qualifying PAIR whose
every shared bucket is oversized is reported through its representative
rather than directly. Fixture-scale corpora never reach the cap, so
oracle-checked outputs are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ssg_etl_spark.cache import persist_tracked

# Buckets holding more ids than this switch from all-pairs to star
# candidates. 2000² = 4M candidate rows is the per-bucket worst case an
# executor comfortably verifies; real near-dup buckets are orders of
# magnitude smaller, so the cap only triggers on degenerate content
# families (which is exactly when all-pairs output is itself quadratic
# and unwanted).
DEFAULT_MAX_BUCKET_OCCUPANCY = 2000

def minhash_signature(
    items: DataFrame, id_col: str, item_col: str, num_hashes: int
) -> DataFrame:
    """One row per id with ``num_hashes`` min-hash columns h0..h{k-1}.

    The item string is hashed ONCE per row (``xxhash64``); the k hash
    functions are ``xxhash64(lit(i), _h)`` — k independent cheap hashes
    over the single 8-byte value, not k full string hashes (the original
    construction, which dominated signature cost at 64 hashes). Min over
    the signed-long order of a per-i keyed hash is a valid minwise family
    (any family of near-independent total orders works). Unlike the
    interim wrapping-multiply affine mix, this is ANSI-safe: no long
    arithmetic, so the plan is correct under both ``spark.sql.ansi
    .enabled`` settings and in embedding applications that supply their
    own SparkSession (PySpark 4.x defaults ANSI ON).
    """
    hashed = items.select(F.col(id_col), F.xxhash64(F.col(item_col)).alias("_h"))
    return hashed.groupBy(id_col).agg(
        *[
            F.min(F.xxhash64(F.lit(i), F.col("_h"))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )


def band_buckets(
    sig: DataFrame, id_col: str, num_hashes: int, rows_per_band: int
) -> DataFrame:
    """Explode a signature table into (id, band, bucket) LSH postings:
    bucket = xxhash64 over the band's signature rows."""
    num_bands = num_hashes // rows_per_band
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
            ).alias("bucket"),
        )
        for b in range(num_bands)
    ]
    return sig.select(
        id_col, F.explode(F.array(*band_cols)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def capped_self_join_pairs(
    postings: DataFrame,
    key_cols: list[str],
    id_col: str,
    out_a: str,
    out_b: str,
    max_occupancy: int | None = DEFAULT_MAX_BUCKET_OCCUPANCY,
) -> DataFrame:
    """Candidate pairs (out_a < out_b) from a bucket self-join, with the
    occupancy guard described in the module docstring.

    Plan shape: one map-side-combined aggregation on the bucket key yields
    the (tiny, persisted) oversized-bucket list, checked eagerly on the
    driver — the healthy-corpus fast path (no bucket over the cap, i.e.
    every corpus outside the degenerate template-family case) falls
    straight through to the plain self-join with ONE cheap aggregation
    job as its only overhead. Only when oversized buckets exist does the
    plan grow the broadcast anti-join + star branch (measured: the
    always-on guard plan cost ~5 s on a 14 s sf0.1 minhash run with zero
    hot buckets; the eager branch restores that). Callers should persist
    ``postings`` — it is consumed by the occupancy aggregation and both
    self-join sides.
    """
    star = None
    if max_occupancy is not None:
        hot = persist_tracked(
            postings.groupBy(*key_cols)
            .agg(
                F.count(F.lit(1)).alias("_occ"),
                F.min(id_col).alias("_rep"),
            )
            .filter(F.col("_occ") > max_occupancy)
        )
        if hot.isEmpty():
            small = postings
        else:
            small = postings.join(
                F.broadcast(hot.select(*key_cols)), key_cols, "left_anti"
            )
            star = (
                postings.join(F.broadcast(hot), key_cols)
                .filter(F.col(id_col) != F.col("_rep"))
                .select(F.col("_rep").alias(out_a), F.col(id_col).alias(out_b))
            )
    else:
        small = postings
    x = small.alias("x")
    y = small.alias("y")
    cond = F.col(f"x.{id_col}") < F.col(f"y.{id_col}")
    for k in key_cols:
        cond = cond & (F.col(f"x.{k}") == F.col(f"y.{k}"))
    pairs = x.join(y, cond).select(
        F.col(f"x.{id_col}").alias(out_a), F.col(f"y.{id_col}").alias(out_b)
    )
    if star is not None:
        pairs = pairs.unionByName(star)
    return pairs.distinct()


def hot_bucket_list(
    postings: DataFrame,
    key_cols: list[str],
    id_col: str,
    max_occupancy: int | None = DEFAULT_MAX_BUCKET_OCCUPANCY,
) -> DataFrame:
    """(key_cols…, _occ, _rep) for buckets over the occupancy cap — the
    tiny table both guard forms consume. For a persisted index this is
    the artifact to precompute at build time so probes never re-aggregate
    the corpus postings."""
    if max_occupancy is None:
        return postings.select(
            *key_cols,
            F.lit(0).cast("long").alias("_occ"),
            F.col(id_col).alias("_rep"),
        ).limit(0)
    return (
        postings.groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).alias("_occ"),
            F.min(id_col).alias("_rep"),
        )
        .filter(F.col("_occ") > max_occupancy)
    )


def capped_probe_join_pairs(
    delta_postings: DataFrame,
    base_postings: DataFrame,
    key_cols: list[str],
    delta_id: str,
    base_id: str,
    out_delta: str,
    out_base: str,
    max_occupancy: int | None = DEFAULT_MAX_BUCKET_OCCUPANCY,
    hot_buckets: DataFrame | None = None,
) -> DataFrame:
    """Delta×base candidate pairs with a BASE-side occupancy guard — the
    probe-join twin of :func:`capped_self_join_pairs`.

    The delta side is batch-sized by contract, so the unbounded term is
    a degenerate BASE bucket: occupancy_base × occupancy_delta rows per
    (band, bucket). Oversized base buckets are removed from the join and
    each matching delta posting meets the bucket's REPRESENTATIVE (min
    base id) instead — one candidate per delta member, connectivity to
    the base family preserved through the rep, exact verification
    unchanged. ``hot_buckets`` (from :func:`hot_bucket_list`) should be
    the PRECOMPUTED index artifact when the base is a persisted index —
    computing it in-probe costs one aggregation over the corpus-sized
    postings, which defeats the per-batch cost contract at scale.
    """
    d = delta_postings.select(F.col(delta_id).alias("_did"), *key_cols)
    b = base_postings.select(F.col(base_id).alias("_bid"), *key_cols)
    star = None
    if max_occupancy is not None or hot_buckets is not None:
        if hot_buckets is None:
            hot_buckets = hot_bucket_list(
                base_postings, key_cols, base_id, max_occupancy
            )
        hot = persist_tracked(hot_buckets)
        if not hot.isEmpty():
            b = b.join(
                F.broadcast(hot.select(*key_cols)), key_cols, "left_anti"
            )
            star = d.join(F.broadcast(hot), key_cols).select(
                F.col("_did").alias(out_delta), F.col("_rep").alias(out_base)
            )
    pairs = d.join(b, key_cols).select(
        F.col("_did").alias(out_delta), F.col("_bid").alias(out_base)
    )
    if star is not None:
        pairs = pairs.unionByName(star)
    return pairs.distinct()
