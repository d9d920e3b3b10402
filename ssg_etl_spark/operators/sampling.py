"""Deterministic sampling/splitting for training-data pipelines
(BASELINE.json north-star extensions; no reference twin — the reference
never samples, but every corpus pipeline needs reproducible splits).

Spark's ``randomSplit``/``sample`` are seed-dependent AND partitioning-
dependent (a repartition changes the rows a seed selects), which makes
results unreproducible across cluster sizes and impossible to oracle.
Everything here derives from content hashes instead: the same row lands in
the same split on 1 executor or 1000, and DuckDB can replay the exact
assignment.

Scale: both operators are pure column expressions plus (for the stratified
form) one window over the stratum key — one shuffle, no RNG, no driver
state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 2^32 — the hash bucket space. First 8 md5 hex chars = uniform uint32.
_BUCKETS = 1 << 32


def hash_bucket(id_col: Column | str) -> Column:
    """Deterministic uniform bucket in [0, 2^32): first 8 hex chars of
    md5(id) — engine-portable (DuckDB: ``('0x' || substr(md5(x),1,8))::BIGINT``)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.conv(F.substring(F.md5(c.cast("string").cast("binary")), 1, 8), 16, 10).cast(
        "long"
    )


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train: float = 0.8,
    val: float = 0.1,
) -> DataFrame:
    """Reproducible train/val/test assignment by id hash.

    A row's split is a pure function of its id — stable under repartition,
    re-run, cluster resize, and incremental appends (new rows don't move
    old rows between splits, unlike any fraction-of-count scheme).
    """
    if not (0 < train < 1 and 0 <= val < 1 and train + val <= 1):
        raise ValueError("need 0<train<1, 0<=val<1, train+val<=1")
    b = hash_bucket(id_col)
    split = (
        F.when(b < int(train * _BUCKETS), "train")
        .when(b < int((train + val) * _BUCKETS), "val")
        .otherwise("test")
    )
    return df.select(F.col(id_col), b.alias("bucket"), split.alias("split"))


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic k-per-stratum sample: rank rows within each stratum by
    id hash (ties broken by id) and keep the first k.

    Hash order is a reproducible shuffle — unbiased w.r.t. any natural
    ordering of the data, identical across engines and cluster layouts.
    The window shuffles once on the stratum key; rank-limit pushdown
    (WindowGroupLimit) keeps only k rows per stratum before the final
    exchange.
    """
    w = Window.partitionBy(*strata_cols).orderBy(
        F.md5(F.col(id_col).cast("string").cast("binary")), F.col(id_col)
    )
    return (
        df.select(*strata_cols, id_col)
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Per-source mixture sampling with epoch weights — the data-mixing op
    behind every training corpus recipe ("web at 0.5 epochs, books at 2.3").

    ``rates[source] = 2.25`` emits every row of that source twice
    (epochs 0,1) plus a deterministic 25% third copy (epoch 2); ``0.5``
    keeps a deterministic half at epoch 0; sources absent from ``rates``
    are dropped. The fractional keep is a hash-threshold Bernoulli on
    md5(id:epoch:seed) — a pure row function: stable under repartition and
    cluster resize, unlike ``DataFrame.sample``, and replayable by the
    DuckDB oracle. Replication is a sequence+explode (JVM-side, output
    rows ~ Σ rate·|source|); the rates map is a literal expression, so the
    whole plan is scan → project → explode → filter with zero joins and
    zero shuffles.
    """
    if not rates:
        raise ValueError("rates must name at least one source")
    if any(r < 0 for r in rates.values()):
        raise ValueError("rates must be >= 0")
    rate_map = F.create_map(
        *[x for s, r in rates.items() for x in (F.lit(s), F.lit(float(r)))]
    )
    return _epoch_bernoulli(
        df.withColumn("_rate", rate_map[F.col(source_col)]), id_col, seed
    )


def plan_token_mixture(
    df: DataFrame,
    weights: dict[str, float],
    budget_tokens: int,
    token_col: str = "n_tokens",
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Budget-constrained mix RECIPE: given target token PROPORTIONS per
    source and a total token budget, derive each source's epoch rate —
    ``rate_s = budget·w_s / tokens_s`` — and emit the sampled mix (the
    composition every training-data recipe needs: "books at 15% of 1T
    tokens" becomes "2.3 epochs of books" only after looking at how many
    book tokens exist).

    ``weights`` must be normalized (sum to 1) — the solver refuses to
    renormalize silently, because addition order over the weights dict
    would make the derived rates engine-dependent; with normalized
    weights each rate is ONE multiply + ONE divide on the per-source
    token total (exact BIGINT), bit-replayable in SQL. One k-row
    aggregation to the driver; the sampling itself is
    :func:`mixture_sample`'s zero-shuffle epoch explode. Sources above
    1 epoch repeat data (upsampling); the output carries the rate so the
    plan is auditable per row.
    """
    if not weights:
        raise ValueError("weights must name at least one source")
    if any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be positive")
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError("weights must sum to 1 (pre-normalize explicitly)")
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    totals = {
        r["s"]: r["t"]
        for r in df.groupBy(F.col(source_col).alias("s"))
        .agg(F.sum(token_col).alias("t"))
        .collect()
    }
    missing = [s for s in weights if s not in totals or not totals[s]]
    if missing:
        raise ValueError(f"sources with no tokens in the corpus: {missing}")
    rates = {s: budget_tokens * w / totals[s] for s, w in weights.items()}
    rate_map = F.create_map(
        *[x for s, r in rates.items() for x in (F.lit(s), F.lit(float(r)))]
    )
    return mixture_sample(df, rates, source_col, id_col, seed).withColumn(
        "rate", F.round(rate_map[F.col(source_col)], 12)
    )


def _hash_uniform48(parts: list[Column], open_zero: bool = False) -> Column:
    """Deterministic hash-uniform: first 48 bits of md5(':'-joined parts)
    over 2^48 — [0, 1), or (0, 1] with ``open_zero`` (adds 1 before the
    division, for keys that must never be exactly 0). The ONE Spark-side
    construction every sampling oracle replays as
    ``('0x' || substr(md5(a || ':' || b), 1, 12))::BIGINT / 2^48`` —
    hex width, offsets, and divisor live here only."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", *parts).cast("binary")), 1, 12),
        16,
        10,
    ).cast("long")
    if open_zero:
        h = h + F.lit(1)
    return h / F.lit(float(1 << 48))


def _epoch_bernoulli(df: DataFrame, id_col: str, seed: int) -> DataFrame:
    """Shared epoch-replication core: given rows carrying a ``_rate``
    column, emit ``floor(rate)`` full epochs plus a deterministic
    fractional epoch kept when md5(id:epoch:seed)-uniform < frac.
    Pure row function — zero joins/shuffles beyond the input's own plan;
    consumed by :func:`mixture_sample` (literal rates) and
    :func:`temperature_mixture` (data-derived rates)."""
    n_full = F.floor(F.col("_rate")).cast("int")
    with_epoch = (
        df.filter(F.col("_rate").isNotNull() & (F.col("_rate") > 0))
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), n_full)))
    )
    u = _hash_uniform48(
        [
            F.col(id_col).cast("string"),
            F.col("epoch").cast("string"),
            F.lit(str(seed)),
        ]
    )
    kept = with_epoch.filter(
        (F.col("epoch") < F.floor(F.col("_rate")).cast("int"))
        | (u < (F.col("_rate") - F.floor(F.col("_rate"))))
    )
    return kept.drop("_rate")


def temperature_mixture(
    df: DataFrame,
    alpha: float,
    group_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
    max_rate: float = 8.0,
) -> DataFrame:
    """Temperature-based (alpha) group rebalancing — the multilingual
    mixing rule behind mBERT/XLM-R-style corpora: sample group ``g`` with
    probability q_g ∝ p_g^alpha (p_g the natural share), so rare
    languages/sources are upsampled and dominant ones downsampled while
    the expected corpus size stays N. alpha=1 is the natural mix,
    alpha→0 uniform-over-groups.

    Per-group epoch rate = N · n_g^(alpha-1) / Σ_h n_h^alpha, clamped to
    ``max_rate`` (a tiny group under small alpha would otherwise explode
    into thousands of copies — the clamp bounds the fan-out and is
    mirrored in the oracle). Rates come from one group-count aggregation
    (dimension-sized: one row per language/source); the normalizer is a
    DECIMAL sum of the per-group n^alpha terms, so it is exact and
    order-independent — the one double-sum that would otherwise make the
    rate engine-dependent. The rates frame broadcasts back onto the
    corpus; replication/fractional epochs ride
    :func:`_epoch_bernoulli`'s hash-threshold contract
    (repartition-stable, oracle-replayable).

    Plan: scan → count-agg (dimension-sized) → broadcast join → explode →
    filter. Returns the input id/group plus ``epoch``. Rows with a NULL
    group key are EXCLUDED (the rate join is inner, identically in the
    oracle's ``JOIN USING``): a NULL language/source has no principled
    rate under the temperature rule — pre-coalesce the key (e.g. to
    'und') to give unattributed rows an explicit group instead.
    """
    if not (0 < alpha <= 1):
        raise ValueError("alpha must be in (0, 1]")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    n_d = F.col("_n").cast("double")
    # alpha = 0.5 (the common temperature) goes through sqrt, which IEEE
    # guarantees correctly rounded in every engine; generic alpha uses
    # libm pow, where the JVM (Math.pow, 1-ulp tolerance) and the
    # oracle's glibc may differ in the last ulp — harmless for sampling
    # quality, but only the sqrt path is bit-replayable by the oracle.
    if alpha == 0.5:
        z_term = F.sqrt(n_d)
        rate_raw = (
            lambda total, z: total.cast("double") / F.sqrt(n_d) / z.cast("double")
        )
    else:
        z_term = F.pow(n_d, F.lit(alpha))
        rate_raw = (
            lambda total, z: total.cast("double")
            * F.pow(n_d, F.lit(alpha - 1.0))
            / z.cast("double")
        )
    norm = counts.agg(
        F.sum(z_term.cast("decimal(38,18)")).alias("_z"),
        F.sum("_n").alias("_total"),
    )
    rates = counts.crossJoin(F.broadcast(norm)).select(
        group_col,
        F.least(
            rate_raw(F.col("_total"), F.col("_z")),
            F.lit(float(max_rate)),
        ).alias("_rate"),
    )
    with_rate = df.select(F.col(id_col), F.col(group_col)).join(
        F.broadcast(rates), group_col
    )
    return _epoch_bernoulli(with_rate, id_col, seed)


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic weighted sampling without replacement (sequential
    Poisson sampling, Ohlsson 1998): rank every row by ξ = u / w — u a
    hash-uniform in (0, 1] from md5(id:seed), w the row's weight — and
    keep the k smallest. Inclusion probability is approximately
    proportional to weight (πps), the standard scheme for
    quality-weighted corpus subsampling, and unlike ``DataFrame.sample``
    the result is a pure function of (id, weight): stable under
    repartition, cluster resize, and re-run, and replayable by the SQL
    oracle (u/w is one IEEE double division — bit-identical across
    engines, no pow/log whose libm rounding could diverge).

    Rows with NULL or non-positive weight are excluded (unsamplable).
    The global top-k is ``orderBy(ξ).limit(k)`` — Spark plans
    TakeOrderedAndProject: per-partition partial top-k then a k-row
    merge, no global sort, no single-task funnel. Returns
    (id, weight, ξ) for auditability of the cut point.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    w = F.col(weight_col).cast("double")
    u = _hash_uniform48(
        [F.col(id_col).cast("string"), F.lit(str(seed))], open_zero=True
    )
    ranked = (
        df.filter(w.isNotNull() & (w > 0))
        .select(F.col(id_col), w.alias("weight"), (u / w).alias("xi"))
    )
    return ranked.orderBy("xi", id_col).limit(k)


def group_split(
    df: DataFrame,
    group_col: str,
    id_col: str = "doc_id",
    train: float = 0.8,
    val: float = 0.1,
) -> DataFrame:
    """Leakage-safe train/val/test assignment: the split is a pure
    function of the GROUP key (registrable domain, near-dup cluster id,
    author…), so every correlated document lands in the SAME split — the
    standard guard against evaluation leakage through near-duplicates and
    same-site pages, which a per-document split cannot give you.

    Same hash-threshold contract as :func:`hash_split` (stable under
    repartition, re-run, and appends); the plan is one projection — no
    join, no shuffle — because the group key is already on the row.
    Returns (id, group, bucket, split). A NULL group key hashes to a NULL
    bucket and falls through to 'test' (identically in the SQL oracle's
    CASE) — quarantining unattributable rows in the split that never
    trains is the safe default, but callers who consider NULL groups
    uncorrelated should pre-coalesce the key to the row id.
    """
    if not (0 < train < 1 and 0 <= val < 1 and train + val <= 1):
        raise ValueError("need 0<train<1, 0<=val<1, train+val<=1")
    b = hash_bucket(group_col)
    split = (
        F.when(b < int(train * _BUCKETS), "train")
        .when(b < int((train + val) * _BUCKETS), "val")
        .otherwise("test")
    )
    return df.select(
        F.col(id_col), F.col(group_col), b.alias("bucket"), split.alias("split")
    )


def token_budget_selection(
    df: DataFrame,
    budget_tokens: int,
    score_col: str = "quality_score",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus selection under a token budget: take documents in
    quality-descending order (ties by id) until the cumulative token
    count exceeds the budget — "train on the best N tokens", the
    data-selection step behind quality-pruned training mixes.

    The global ordered cumulative sum uses the same two-level histogram
    scheme as ``analytics.global_row_number`` (W2): token sums per
    DISTINCT score prefix (dimension-sized — scores are rounded/banded by
    construction), coarse-bucket offsets from a driver-collected handful
    of aggregate rows, and a running sum WINDOW only within each score
    group — no single-partition window anywhere, no row funnels through
    one task. Rows with NULL score are excluded (unrankable), matching
    the oracle's WHERE.

    Returns (id, score, tokens, cum_tokens, selected); ``selected`` marks
    the kept prefix. Callers filter on it — emitting the full ranking
    keeps the op auditable (how far past the budget each document fell).
    """
    from ssg_etl_spark.operators.analytics import ordered_prefix_offsets

    from ssg_etl_spark.cache import persist_tracked

    base = df.filter(F.col(score_col).isNotNull()).select(
        F.col(id_col), F.col(score_col), F.col(token_col)
    )
    neg = (-F.col(score_col)).alias("_neg")
    # Persisted (r13): both the offsets aggregation and the final join
    # consume these rows, and the caller's score column is typically a
    # derived metric (text_metrics regex passes) — unpersisted, that
    # featurization ran twice (two identical 15 s executorRunTime stages
    # at sf0.1). Narrow rows: (id, score, tokens, _neg).
    rows = persist_tracked(base.select("*", neg))
    offsets = ordered_prefix_offsets(
        rows,
        "_neg",
        lambda c: F.floor(F.col(c) * 10),
        weight_col=token_col,
    )
    w_local = (
        Window.partitionBy("_neg")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (F.col("_offset") + F.sum(token_col).over(w_local)).cast("long")
    return (
        rows.join(F.broadcast(offsets), F.col("_neg") == F.col("_prefix"))
        .select(
            F.col(id_col),
            F.col(score_col),
            F.col(token_col),
            cum.alias("cum_tokens"),
            (cum <= budget_tokens).alias("selected"),
        )
    )


def deterministic_shuffle(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Reproducible global permutation of the corpus: rank every row by
    (md5(id), id) — the pre-training "shuffle the dataset" step, made a
    pure function of content ids so it replays identically across
    cluster sizes and reruns (Spark's own shuffle/randomSplit order is
    partitioning-dependent and unreproducible).

    The global rank rides :func:`analytics.global_row_number`'s two-level
    histogram scheme, keyed on a 4-hex-char hash prefix (65 536 groups —
    dimension-sized REGARDLESS of corpus size, uniformly filled because
    the prefix is itself hash output) with 256 coarse buckets for the
    offset cumsum; no single-partition window, no row funnels through one
    task. Returns (id, shuffle_rank) with ranks 1..N dense and unique.
    """
    from ssg_etl_spark.operators.analytics import global_row_number

    h = F.md5(F.col(id_col).cast("string").cast("binary"))
    with_h = df.select(F.col(id_col)).withColumn("_h", h).withColumn(
        "_hp", F.substring(F.col("_h"), 1, 4)
    )
    ranked = global_row_number(
        with_h,
        "_hp",
        ["_h", id_col],
        out_col="shuffle_rank",
        coarse_fn=lambda c: F.conv(F.substring(F.col(c), 1, 2), 16, 10),
    )
    return ranked.select(F.col(id_col), F.col("shuffle_rank"))
