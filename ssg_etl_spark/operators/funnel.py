"""User-journey analytics over event streams: ordered funnels and cohort
retention — the two classic "how do users move through time" operators an
event table supports (reference's event DAGs stop at windowed counts;
these are their natural analytical extensions).

Scale shape: every stage is an equi-join or aggregation keyed on
``user_id`` (hash-shuffled, map-side combinable, no single-task funnels
— pun intended, no global windows anywhere). The per-step join frontier
shrinks monotonically (only users who completed step i-1 survive), so
later steps cost less, not more.

Timestamp semantics: ``load_table`` guarantees every timestamp column is
TIMESTAMP_NTZ carrying UTC wall-clock fields (the round-8 time contract,
sources/tables.py), so calendar-field extraction here — cohort days,
cohort months — is session-zone-free BY TYPE; comparisons and min/max are
wall-field-ordered, consistent with the same contract. Do NOT wrap these
columns in ``utc_wall`` — on NTZ input it would reinterpret the wall
fields through the ambient session zone and shift them (the round-7
advisor's cohort finding, generalized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strict-order funnel: for each user who performed ``steps[0]``, the
    earliest completion time of each subsequent step STRICTLY AFTER the
    previous step's time (the earliest-first-then-earliest-next greedy —
    the standard funnel semantics; ties at the exact same timestamp do
    not advance the funnel, keeping the rule total and deterministic).

    One row per step-1 user: ``(user, step1_ts..stepN_ts, steps_completed)``
    with NULL timestamps past the drop-off point.
    """
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    out = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("user"))
        .agg(F.min(ts_col).alias("step1_ts"))
    )
    for i, step in enumerate(steps[1:], start=2):
        prev = f"step{i - 1}_ts"
        nxt = (
            events.filter(F.col(type_col) == step)
            .select(F.col(user_col).alias("user"), F.col(ts_col).alias("_t"))
            .join(out.select("user", prev), "user")
            .filter(F.col("_t") > F.col(prev))
            .groupBy("user")
            .agg(F.min("_t").alias(f"step{i}_ts"))
        )
        out = out.join(nxt, "user", "left")
    completed = sum(
        (F.col(f"step{i}_ts").isNotNull().cast("int"))
        for i in range(1, len(steps) + 1)
    )
    return out.withColumn(
        "steps_completed", completed.cast("bigint")
    ).withColumnRenamed("user", user_col)


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "day",
    with_size: bool = False,
) -> DataFrame:
    """Cohort-retention matrix at daily or monthly granularity: users are
    cohorted by the calendar period of their first event; each later
    active period increments the cohort's ``periods_since`` cell.
    ``retained_pct`` is the cell count over the cohort's period-0 size
    (period 0 is 100% by construction).

    Two shuffles total: the per-user first-event min (map-side combined,
    with the user's distinct active periods collected alongside — a
    bounded set, ≤ periods in the data's time span) and the
    (cohort, period) count — both keyed, both bounded by |users| rows,
    not |events|.
    """
    wall = F.col(ts_col)  # NTZ-UTC by the load_table contract
    if period == "day":
        # Epoch-day ordinal of the UTC calendar day, session-zone-free.
        pnum = F.datediff(
            wall.cast("date"), F.lit("1970-01-01").cast("date")
        ).alias("_p")

        def label(c):
            return F.date_format(
                F.date_add(F.lit("1970-01-01").cast("date"), c.cast("int")),
                "yyyy-MM-dd",
            )

    elif period == "month":
        pnum = (F.year(wall) * 12 + F.month(wall) - 1).alias("_p")

        def label(c):
            return F.concat_ws(
                "-",
                F.floor(c / 12).cast("string"),
                F.lpad((c % 12 + 1).cast("string"), 2, "0"),
            )

    else:
        raise ValueError(f"unsupported period: {period!r}")

    active = (
        events.select(F.col(user_col).alias("user"), pnum)
        .groupBy("user")
        .agg(
            F.min("_p").alias("_first_p"),
            F.array_sort(F.collect_set("_p")).alias("_periods"),
        )
        .select("user", "_first_p", F.explode("_periods").alias("_p"))
    )
    cells = active.groupBy(
        F.col("_first_p").alias("_cohort_p"),
        (F.col("_p") - F.col("_first_p")).cast("bigint").alias("periods_since"),
    ).agg(F.count(F.lit(1)).alias("n_users"))
    base = cells.filter(F.col("periods_since") == 0).select(
        "_cohort_p", F.col("n_users").alias("_cohort_size")
    )
    # with_size: expose the exact cohort size for downstream pooling
    # (curve aggregation) — the rounded pct cannot be inverted losslessly.
    extra = (
        [F.col("_cohort_size").alias("cohort_size")] if with_size else []
    )
    return (
        cells.join(base, "_cohort_p")
        .select(
            label(F.col("_cohort_p")).alias("cohort_period"),
            "periods_since",
            "n_users",
            F.round(
                F.col("n_users").cast("double")
                / F.col("_cohort_size").cast("double")
                * 100.0,
                4,
            ).alias("retained_pct"),
            *extra,
        )
    )


def funnel_summary(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-step conversion table from :func:`funnel_steps`: one row per
    step with the surviving-user count, conversion from the previous
    step, and conversion from step 1 — the deliverable a funnel is
    usually asked for. The per-user table reduces to ``len(steps)``
    counts in one aggregation; everything after is driver-free column
    math on a steps-sized frame."""
    per_user = funnel_steps(events, steps, user_col, ts_col, type_col)
    counts = per_user.agg(
        *[
            F.count(F.col(f"step{i}_ts")).alias(f"_n{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    rows = None
    for i, step in enumerate(steps, start=1):
        prev = F.col(f"_n{i - 1}") if i > 1 else F.col("_n1")
        row = counts.select(
            F.lit(i).cast("int").alias("step_no"),
            F.lit(step).alias("step"),
            F.col(f"_n{i}").alias("n_users"),
            F.round(
                F.when(prev > 0, F.col(f"_n{i}").cast("double") / prev.cast("double") * 100.0)
                .otherwise(F.lit(None).cast("double")),
                4,
            ).alias("pct_of_prev"),
            F.round(
                F.when(F.col("_n1") > 0, F.col(f"_n{i}").cast("double") / F.col("_n1").cast("double") * 100.0)
                .otherwise(F.lit(None).cast("double")),
                4,
            ).alias("pct_of_first"),
        )
        rows = row if rows is None else rows.unionByName(row)
    return rows


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order (Markov) transition matrix over per-user event
    sequences: consecutive event-type pairs in time order (ties broken by
    event id — a total, partitioning-independent order), counted and
    normalized per source state. The lag window is user-partitioned —
    per-partition work is one user's history, never the corpus."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.select(
            F.lag(type_col).over(w).alias("from_type"),
            F.col(type_col).alias("to_type"),
        )
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("_row_n"))
    return pairs.join(totals, "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.col("_row_n").cast("double"), 6
        ).alias("p"),
    )
