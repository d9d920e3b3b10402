"""Record linkage / entity resolution: blocking-key candidate generation
with an oversized-block guard, plus edit-distance fuzzy matching — the
structured-record twin of the document dedup family (customer/master-data
dedup before records feed a training mix or a dimension merge).
BASELINE.json north-star extension; no reference counterpart.

Scale design (the Fellegi-Sunter blocking shape): the only join is an
equi-join on the blocking key, so candidate count is Σ_b |L_b|·|R_b| —
bounded by the block guard below, never all-pairs. The edit-distance
compare runs JVM-side (``F.levenshtein``), post-join, only on candidates.

Block skew: a degenerate blocking key (empty string, a default value,
one mega-city) makes one block quadratic and lands it on one reducer —
the exact failure mode of an LSH mega-bucket. ``max_block_pairs`` drops
those blocks (standard linkage practice: an over-populated block is
non-discriminative — tighten the key rather than burn the cluster), same
drop-with-documented-contract as dedup's ``_cap_shingle_df`` and the LSH
``max_bucket_occupancy`` guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 4M candidate pairs per block ≈ one executor-sized join task even with
# wide compare columns; blocks past this are non-discriminative.
DEFAULT_MAX_BLOCK_PAIRS = 4_000_000


def blocked_candidates(
    left: DataFrame,
    right: DataFrame,
    block_cols: list[str],
    max_block_pairs: int | None = DEFAULT_MAX_BLOCK_PAIRS,
) -> DataFrame:
    """Candidate pairs via blocking-key equi-join.

    ``left`` / ``right`` column sets must be disjoint apart from
    ``block_cols`` (prefix them upstream). NULL in any block column never
    matches (SQL equi-join semantics) — rows with NULL keys generate no
    candidates rather than one phantom mega-block.

    Blocks whose |L_b|·|R_b| exceeds ``max_block_pairs`` are dropped
    before the join: the guard aggregation shuffles on the same key as
    the join would, so it removes the skew it measures. The oversized-
    block list is tiny by construction → broadcast anti-join.
    """
    if max_block_pairs is not None:
        sizes = (
            left.groupBy(*block_cols)
            .agg(F.count(F.lit(1)).alias("_nl"))
            .join(
                right.groupBy(*block_cols).agg(
                    F.count(F.lit(1)).alias("_nr")
                ),
                block_cols,
            )
            .filter(F.col("_nl") * F.col("_nr") > max_block_pairs)
            .select(*block_cols)
        )
        left = left.join(F.broadcast(sizes), block_cols, "left_anti")
        right = right.join(F.broadcast(sizes), block_cols, "left_anti")
    return left.join(right, block_cols)


def fuzzy_match(
    left: DataFrame,
    right: DataFrame,
    block_cols: list[str],
    text_l: str,
    text_r: str,
    max_dist: int,
    max_block_pairs: int | None = DEFAULT_MAX_BLOCK_PAIRS,
) -> DataFrame:
    """Blocked edit-distance record matching: candidates from
    :func:`blocked_candidates`, kept when
    ``levenshtein(text_l, text_r) <= max_dist``. Adds ``edit_dist``.

    ``F.levenshtein`` is a JVM codegen expression (no UDF); Spark 4's
    threshold form short-circuits rows that exceed ``max_dist`` without
    filling the full DP matrix, so a long-string candidate costs
    O(len·max_dist), not O(len²).
    """
    cands = blocked_candidates(left, right, block_cols, max_block_pairs)
    dist = F.levenshtein(F.col(text_l), F.col(text_r), max_dist)
    # threshold form returns -1 when distance > max_dist
    return cands.withColumn("edit_dist", dist).filter(
        F.col("edit_dist") >= 0
    )


def best_match_per_left(
    matches: DataFrame, id_l: str, id_r: str
) -> DataFrame:
    """Resolve to at most one match per left record: minimum edit
    distance, right-id tiebreak. A grouped min-struct aggregation (not a
    window over a digest-like hot key): one map-side-combinable agg even
    when one left record has millions of candidates."""
    pick = F.min(
        F.struct(F.col("edit_dist"), F.col(id_r).alias("_rid"))
    ).alias("_best")
    return (
        matches.groupBy(id_l)
        .agg(pick)
        .select(
            id_l,
            F.col("_best._rid").alias(id_r),
            F.col("_best.edit_dist").alias("edit_dist"),
        )
    )
