"""Range (interval) join — the non-equi time join done scale-safe.

A naive ``a.ts BETWEEN b.ts AND b.ts + tol`` join has no equi key, so
Spark plans BroadcastNestedLoopJoin: every row pair is compared — O(N·M)
work and a broadcast of a whole side. Bucketing by ``floor(ts / tol)``
restores an equi key: two timestamps within ``tol`` of each other land in
the same or adjacent buckets, so joining the left bucket against the
right event replicated into ``{bucket-1, bucket}`` covers every
qualifying pair EXACTLY once (the two replicated keys are distinct, and
the left bucket matches at most one of them), after which the precise
range predicate filters the bucket-mates. Work scales with bucket
occupancy, not corpus size — the same trick the LSH/IVF operators use for
similarity, applied to time.

No reference twin (the reference joins only on equality keys); this is
the range-join capability a Spark-native engine is expected to provide
(BASELINE.json north-star: "as-of join, range join").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_US = 1_000_000


def same_key_burst_pairs(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    tolerance_s: int = 60,
) -> DataFrame:
    """Ordered pairs of same-key events within ``tolerance_s`` of each
    other (burst / near-duplicate-click detection).

    Pair (a, b) qualifies when b is strictly later than a (ties broken by
    id so each unordered pair appears once) and ``ts_b - ts_a ≤ tol``.
    The join key is (key, time bucket): the right side is replicated into
    its own and its predecessor bucket — ``0 ≤ Δ ≤ tol`` implies
    ``bucket_b - bucket_a ∈ {0, 1}``, so coverage is exact with no
    post-join dedup.
    """
    tol_us = tolerance_s * _US
    # Zone-free wall→micros: casting NTZ to TIMESTAMP would reinterpret
    # the wall fields through the ambient session zone; a DST transition
    # inside the data span would then shift pair gaps (tz contract).
    from ssg_etl_spark.functions.scalar import ntz_epoch_micros

    us = ntz_epoch_micros(ts_col)
    # Exact floor division in integer arithmetic (pmod is non-negative, so
    # this is floor — not truncate — for pre-epoch timestamps too). The
    # float form floor(us/tol) risks an off-by-one bucket near exact
    # multiples once |us| approaches double's 2^53 mantissa.
    bucket = (us - F.pmod(us, F.lit(tol_us))) / F.lit(tol_us)
    bucket = bucket.cast("long")
    left = events.select(
        F.col(key_col).alias("_k"),
        F.col(id_col).alias("event_a"),
        us.alias("_ua"),
        bucket.alias("_bucket"),
    )
    right = events.select(
        F.col(key_col).alias("_k"),
        F.col(id_col).alias("event_b"),
        us.alias("_ub"),
        F.explode(F.array(bucket - 1, bucket)).alias("_bucket"),
    )
    pred = (
        (F.col("_ub") > F.col("_ua"))
        | ((F.col("_ub") == F.col("_ua")) & (F.col("event_b") > F.col("event_a")))
    ) & (F.col("_ub") - F.col("_ua") <= tol_us)
    return (
        left.join(right, ["_k", "_bucket"])
        .filter(pred)
        .select(
            F.col("_k").alias(key_col),
            "event_a",
            "event_b",
            (F.col("_ub") - F.col("_ua")).alias("delta_us"),
        )
    )
