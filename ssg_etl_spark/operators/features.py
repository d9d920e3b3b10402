"""ML feature-engineering operators: per-key event-sequence features
(lag / rolling windows) and smoothed target encoding — the feature-store
primitives a training pipeline derives from relational history tables
(BASELINE.json north-star extension; no reference counterpart).

Scale design: every window here is PARTITIONED on the entity key (no
global ordering, no single-partition window — the shape
``tools/plan_audit.py`` rejects); one customer's history sorts inside its
own partition. Target encoding is one map-side-combinable aggregation
producing a category-sized table that broadcasts back to the fact rows.

Determinism (oracle contract): double addition is order-dependent, so
every windowed/grouped sum runs on DECIMAL(28,12) intermediates and the
final columns are rounded doubles — the registry-wide rule
(ssg_etl_spark/plans/registry.py module docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(28,12)"


def sequence_features(
    df: DataFrame,
    key_col: str,
    time_col: str,
    id_col: str,
    value_col: str,
    rolling_n: int = 3,
) -> DataFrame:
    """Per-entity event-sequence features over an ordered history:

    * ``event_seq`` — 1-based position of the event in its entity's
      history (``row_number``),
    * ``days_since_prev`` — gap to the previous event (NULL on the
      first event),
    * ``rolling_avg`` — mean of ``value_col`` over the trailing
      ``rolling_n`` events (frame ``rolling_n - 1 PRECEDING .. CURRENT``),
    * ``cum_value`` — running total of ``value_col``.

    Ordering is ``(time_col, id_col)`` — the id tiebreak makes every
    feature deterministic under equal timestamps.

    Scale: all four features share ONE window partitioned by ``key_col``
    (one shuffle, one sort); no global window. Entity-history skew (a
    customer with millions of events) is bounded by the entity's own row
    count — the partitionBy key is the natural unit of work.
    """
    w = Window.partitionBy(key_col).orderBy(time_col, id_col)
    w_roll = w.rowsBetween(-(rolling_n - 1), 0)
    v_dec = F.col(value_col).cast(_DEC)
    return df.select(
        id_col,
        key_col,
        F.row_number().over(w).alias("event_seq"),
        F.datediff(
            F.col(time_col).cast("date"),
            F.lag(F.col(time_col).cast("date")).over(w),
        ).alias("days_since_prev"),
        F.round(
            F.sum(v_dec).over(w_roll).cast("double")
            / F.count(F.lit(1)).over(w_roll).cast("double"),
            6,
        ).alias("rolling_avg"),
        F.round(F.sum(v_dec).over(w).cast("double"), 6).alias("cum_value"),
    )


def target_encoding_table(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    smoothing: float = 10.0,
) -> DataFrame:
    """Smoothed mean target encoding (the empirical-Bayes shrinkage form):

        enc = (sum_cat + m * global_mean) / (n_cat + m)

    Rare categories shrink toward the global mean (m pseudo-observations
    of it); frequent categories keep their own mean. Returns the
    category-level table ``(cat, n_rows, enc)`` — apply with
    :func:`apply_target_encoding` (a broadcast join; the table is
    category-sized by construction).

    Scale: one aggregation on the category key (map-side combinable);
    the global mean derives from the SAME per-category sums (a second
    tiny aggregation over category rows), so the fact table is scanned
    once. Sums run on DECIMAL(28,12); the scalar shrinkage arithmetic is
    then plain double — same expression tree as the SQL oracle.
    """
    per_cat = df.groupBy(cat_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(target_col).cast(_DEC)).alias("_sum"),
    )
    glob = per_cat.agg(
        (
            F.sum("_sum").cast("double")
            / F.sum("n_rows").cast("double")
        ).alias("_gmean")
    )
    m = F.lit(float(smoothing))
    return per_cat.crossJoin(F.broadcast(glob)).select(
        cat_col,
        "n_rows",
        F.round(
            (F.col("_sum").cast("double") + m * F.col("_gmean"))
            / (F.col("n_rows").cast("double") + m),
            6,
        ).alias("enc"),
    )


def apply_target_encoding(
    df: DataFrame, enc: DataFrame, cat_col: str
) -> DataFrame:
    """Attach the encoding to fact rows. The encoding table is
    category-sized → broadcast; unseen categories get NULL enc (impute
    with the global mean downstream if the model needs a value)."""
    return df.join(
        F.broadcast(enc.select(cat_col, "enc")), cat_col, "left"
    )


def robust_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    z_threshold: float = 3.5,
    exact: bool = True,
) -> DataFrame:
    """Median/MAD robust z-score outlier flags per group:

        z = 0.6745 * (x - median) / MAD,   MAD = median(|x - median|)

    (0.6745 rescales MAD to σ-equivalents under normality — the classic
    Iglewicz-Hoaglin modified z-score; |z| > 3.5 is their recommended
    cut). Unlike mean/stddev z-scores, one huge outlier cannot mask
    itself by inflating the spread. Degenerate groups (MAD = 0: over
    half the values identical) yield NULL z and ``is_outlier`` false —
    flagging everything off-mode in a constant column is a policy call,
    not a default.

    ``exact=True`` computes true medians (two grouped ``percentile``
    aggregations — each keeps a group's values in one aggregation
    state); ``exact=False`` swaps in ``approx_percentile`` (t-digest,
    bounded state) for corpus-scale groups, same contract as
    :func:`percentile_profile` / :func:`winsorize`.

    Scale: two aggregation+broadcast-join rounds on the group key (the
    second pass needs |x - median|, which needs the first pass's
    medians); group-count rows only ever broadcast, the fact table never
    shuffles.
    """
    pct = F.percentile if exact else (
        lambda c, p: F.percentile_approx(c, p, 10_000)
    )
    v = F.col(value_col)
    med = df.groupBy(group_col).agg(
        pct(v, F.lit(0.5)).alias("_med")
    )
    with_med = df.join(F.broadcast(med), group_col)
    mad = with_med.groupBy(group_col).agg(
        pct(F.abs(v - F.col("_med")), F.lit(0.5)).alias("_mad")
    )
    z = F.when(
        F.col("_mad") > 0,
        F.round(F.lit(0.6745) * (v - F.col("_med")) / F.col("_mad"), 6),
    )
    return (
        with_med.join(F.broadcast(mad), group_col)
        .select(
            "*",
            z.alias("robust_z"),
            F.coalesce(
                F.abs(z) > F.lit(float(z_threshold)), F.lit(False)
            ).alias("is_outlier"),
        )
        .drop("_med", "_mad")
    )
