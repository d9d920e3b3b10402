"""Mergeable Bloom-filter-as-data: a bounded membership index a 100 TB
pipeline can build once, persist beside the corpus, and probe forever.

The reference keeps membership questions in the database (semi-join
against the full key table every run); at corpus scale the natural shape
is a SKETCH: a fixed-size bit table per group that answers "definitely
new" / "maybe seen" without touching the raw keys. Same algebra as the
HLL/CMS family (operators/sketches.py):

* BUILD is one aggregation — each key sets k bits; words combine by
  bitwise OR, which is map-side combinable and partition-order-free.
* MERGE is word-wise OR across days/partitions/sources — union of the
  underlying key sets, exactly (no approximation added by merging).
* PROBE broadcasts the word table (W words per group, constant) and
  tests k bits per key — no shuffle of the corpus side at all.
* No false negatives ever; false-positive rate ~ (1 - e^{-kn/m})^k,
  sized by ``n_bits``.

Engine-portable hashing, the CMS pattern: bit position i of a key is the
first 8 hex chars of ``md5(i || ':' || key)`` mod n_bits — DuckDB replays
every bit exactly, so the oracle can rebuild the whole filter in SQL.
Words are 32-bit (stored in BIGINT): both engines then shift/OR entirely
in positive two's-complement range — no sign-bit edge anywhere.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column

WORD_BITS = 32  # 32-bit words in BIGINT keep all shifts sign-safe


def _bit_pos(key: Column, i: int, n_bits: int) -> Column:
    """Engine-portable hash: first 8 md5 hex chars of the seeded key,
    mod n_bits (same construction as sketches._cms_reg)."""
    seeded = F.concat(F.lit(f"{i}:"), key.cast("string"))
    h = F.conv(F.substring(F.md5(seeded.cast("binary")), 1, 8), 16, 10)
    return F.pmod(h.cast("bigint"), F.lit(n_bits))


def bloom_build(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    n_bits: int = 1024,
    k: int = 4,
) -> DataFrame:
    """Build one filter per group: ``(group_cols..., word int, bits bigint)``
    — one row per NON-ZERO word, ≤ n_bits/32 rows per group regardless of
    input size. The aggregation is BIT_OR: map-side combinable, so the
    shuffle carries at most W rows per (group, input partition).

    NULL keys are ignored (membership of NULL is not a meaningful probe,
    and a NULL row would md5 to a phantom bit — the sketches-family NULL
    rule)."""
    if n_bits % WORD_BITS != 0:
        raise ValueError(f"n_bits must be a multiple of {WORD_BITS}")
    if k < 1:
        raise ValueError("k must be positive")
    group_cols = list(group_cols or [])
    key = F.col(key_col)
    pos = F.explode(
        F.array(*[_bit_pos(key, i, n_bits) for i in range(k)])
    ).alias("_pos")
    return (
        df.filter(key.isNotNull())
        .select(*group_cols, pos)
        .select(
            *group_cols,
            (F.col("_pos") / WORD_BITS).cast("int").alias("word"),
            # F.shiftleft takes a literal int shift; a column shift needs
            # the SQL form (same idiom as sketches.hll_estimate).
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pmod(_pos, {WORD_BITS}) AS INT))"
            ).alias("_mask"),
        )
        .groupBy(*group_cols, "word")
        .agg(F.bit_or("_mask").alias("bits"))
    )


def bloom_merge(filters: list[DataFrame], group_cols: list[str] | None = None) -> DataFrame:
    """Word-wise OR of filter tables built with the same (n_bits, k) —
    the union filter of the unioned key sets, exactly."""
    group_cols = list(group_cols or [])
    unioned = reduce(lambda a, b: a.unionByName(b), filters)
    return unioned.groupBy(*group_cols, "word").agg(F.bit_or("bits").alias("bits"))


def bloom_probe(
    bloom: DataFrame,
    keys: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    n_bits: int = 1024,
    k: int = 4,
) -> DataFrame:
    """Membership test per key row: ``maybe_present`` true iff ALL k bits
    are set. The filter side is W rows per group — broadcast; the keys
    side never shuffles. Guarantee: a key that was built in always probes
    true (no false negatives); a true probe may be a false positive at
    the sized rate.

    Output is one row per DISTINCT probe row (the verdict aggregation
    groups by every probe column). Duplicate probe rows collapse into one
    group and answer correctly: the all-bits-set test is ``min(hit) == 1``,
    which is invariant to how many identical rows contributed probe bits
    (the previous ``sum(hit) == k`` broke exactly there — d duplicates
    summed to d*k and reported a built-in key as absent).

    NULL-key policy (mirrors bloom_build's): NULL keys are never built
    into the filter, so a NULL probe key answers ``maybe_present=false``
    — "definitely not present" is exact, not a false negative."""
    group_cols = list(group_cols or [])
    key = F.col(key_col)
    key_group = list(keys.columns)
    probes = keys.select(
        *key_group,
        F.explode(
            F.array(*[_bit_pos(key, i, n_bits) for i in range(k)])
        ).alias("_pos"),
    ).select(
        *key_group,
        (F.col("_pos") / WORD_BITS).cast("int").alias("word"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(pmod(_pos, {WORD_BITS}) AS INT))"
        ).alias("_mask"),
    )
    joined = probes.join(F.broadcast(bloom), [*group_cols, "word"], "left")
    # NULL key → NULL mask → NULL hit for every one of its probe rows;
    # min over all-NULL is NULL, coalesced to false (exact: build skips
    # NULLs). Non-NULL keys always have non-NULL hits (bits coalesced).
    hit = (
        F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("_mask")) != 0
    ).cast("int")
    return (
        joined.groupBy(*key_group)
        .agg(F.coalesce(F.min(hit) == 1, F.lit(False)).alias("maybe_present"))
    )
