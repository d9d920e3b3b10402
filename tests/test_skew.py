"""Salted aggregation/join equal their unsalted twins on skewed data."""

from __future__ import annotations

from pyspark.sql import functions as F

from ssg_etl_spark.operators import skew
from ssg_etl_spark.sources.tables import load_table


def _skewed(spark):
    # 90% of rows share one hot key.
    return spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 9, F.lit("HOT")).otherwise(F.lit("cold")).alias("k"),
        F.col("id").alias("line_id"),
        (F.col("id") % 97).cast("double").alias("v"),
    )


def test_salted_sum_count_exact(spark):
    df = _skewed(spark)
    got = {
        r.k: (r.total_value, r.n_rows)
        for r in skew.salted_sum_count(df, ["k"], "v", spread="line_id").collect()
    }
    want = {
        r.k: (float(r.s), r.c)
        for r in df.groupBy("k")
        .agg(F.sum(F.col("v").cast("decimal(28,6)")).alias("s"), F.count("*").alias("c"))
        .collect()
    }
    assert got == want


def test_salted_join_exact(spark):
    df = _skewed(spark)
    dim = spark.createDataFrame([("HOT", "hot-dim"), ("cold", "cold-dim")], ["k", "label"])
    got = skew.salted_join(df, dim, "k", spread="line_id").orderBy("line_id").collect()
    want = df.join(dim, "k").orderBy("line_id").collect()
    assert [(r.k, r.line_id, r.label) for r in got] == [
        (r.k, r.line_id, r.label) for r in want
    ]


def test_salt_deterministic(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").limit(100)
    a = ev.select(skew.salt_col("event_id", 8).alias("s")).collect()
    b = ev.select(skew.salt_col("event_id", 8).alias("s")).collect()
    assert [r.s for r in a] == [r.s for r in b]
    assert all(0 <= r.s < 8 for r in a)


def test_product_association_hot_basket_cap(spark):
    """Mega-basket (bot cart) is deterministically truncated before the
    O(size²) pair join; normal baskets are unaffected."""
    from ssg_etl_spark.operators.analytics import product_association

    hot = [(0, i) for i in range(200)]          # one 200-item basket
    normal = [(b, i) for b in (1, 2) for i in (10, 20, 30)]
    df = spark.createDataFrame(hot + normal, "basket_id int, item_id int")

    capped = product_association(df, k=10**6, max_basket_size=10)
    rows = capped.collect()
    # Hot basket contributes C(10,2)=45 pairs over its 10 SMALLEST item ids;
    # the two normal baskets contribute C(3,2)=3 shared pairs at freq 2.
    hot_pairs = [r for r in rows if r.item_b < 10]
    assert len(hot_pairs) == 45
    assert all(r.item_a < 10 for r in hot_pairs)
    assert {(r.item_a, r.item_b, r.frequency) for r in rows if r.frequency == 2} == {
        (10, 20, 2), (10, 30, 2), (20, 30, 2),
    }
    # Truncation is total: no pair reaches beyond the 10 kept hot items.
    assert all(r.item_b <= 9 for r in hot_pairs)

    # Exact mode: all C(200,2) pairs (the normal baskets' items are a
    # subset of the hot basket's, so they add frequency, not new pairs).
    exact = product_association(df, k=10**6, max_basket_size=None)
    assert exact.count() == 200 * 199 // 2


def test_product_association_salted_equals_unsalted(spark):
    """Hot-pair corpus (two staple items co-bought in almost every basket)
    through the QUERY path: the salted two-stage pair count must return
    exactly the unsalted result — same pairs, same frequencies, same
    top-k order."""
    from ssg_etl_spark.operators.analytics import product_association

    # 500 baskets all containing the staple pair (1, 2); every 5th basket
    # adds a long-tail item, so frequencies span hot and cold keys.
    rows = [(b, i) for b in range(500) for i in (1, 2)]
    rows += [(b, 100 + b % 7) for b in range(0, 500, 5)]
    df = spark.createDataFrame(rows, "basket_id int, item_id int")

    unsalted = product_association(df, k=50)
    salted = product_association(df, k=50, n_salts=16)
    want = [(r.item_a, r.item_b, r.frequency) for r in unsalted.collect()]
    got = [(r.item_a, r.item_b, r.frequency) for r in salted.collect()]
    assert got == want
    assert want[0] == (1, 2, 500)  # the hot pair really is hot


def test_salted_association_megarow_hot_pair(spark):
    """Measured skew evidence at ~3.2M (basket, item) rows with one pair
    in EVERY basket (frequency 10^6): the salted two-stage plan must
    return exactly the unsalted result and add no material overhead.

    Measured at local[32] (medians of 3): unsalted 3.5 s, salted 3.1 s.
    The lesson is recorded honestly in COVERAGE.md: map-side partial
    aggregation already absorbs hot-KEY skew in the final count (each
    reducer receives one partial row per map partition), so salting is
    ~free here; its real wins are regimes partial aggregation can't
    cover (reducer heaps blown by high-cardinality group keys, salted
    replicated joins, stream-static joins outside AQE's reach). Gated
    behind RUN_SLOW_BENCH=1 — wall-clock assertions on a shared box are
    flaky by nature; the default suite keeps the small-corpus equality
    test above.
    """
    import os
    import statistics
    import time

    import pytest as _pytest

    if os.environ.get("RUN_SLOW_BENCH") != "1":
        _pytest.skip("set RUN_SLOW_BENCH=1 for the megarow skew benchmark")

    from pyspark.sql import functions as F

    from ssg_etl_spark.operators.analytics import product_association

    n = 1_000_000
    base = spark.range(0, n).select(F.col("id").alias("basket_id"))
    hot = base.select(
        "basket_id", F.explode(F.array(F.lit(1), F.lit(2))).alias("item_id")
    )
    tail = spark.range(0, n, 3).select(
        F.col("id").alias("basket_id"),
        F.explode(
            F.array(
                (F.col("id") % 997 + 100).cast("int"),
                (F.col("id") % 89 + 5000).cast("int"),
            )
        ).alias("item_id"),
    )
    df = hot.unionByName(tail).persist()
    df.count()
    try:
        def median_wall(fn, trials=3):
            walls = []
            for _ in range(trials):
                t0 = time.time()
                fn().write.mode("overwrite").format("noop").save()
                walls.append(time.time() - t0)
            return statistics.median(walls)

        unsalted = median_wall(lambda: product_association(df, k=50))
        salted = median_wall(lambda: product_association(df, k=50, n_salts=16))
        # Identical output (the equality contract at megarow scale)…
        want = [
            (r.item_a, r.item_b, r.frequency)
            for r in product_association(df, k=50).collect()
        ]
        got = [
            (r.item_a, r.item_b, r.frequency)
            for r in product_association(df, k=50, n_salts=16).collect()
        ]
        assert got == want
        assert want[0] == (1, 2, n)
        # …and no material overhead from the extra stage (generous bound:
        # shared-box walls swing; the point is "salting is safe to leave
        # on", not a microbenchmark).
        assert salted <= unsalted * 1.5, (salted, unsalted)
    finally:
        df.unpersist()


def test_salted_join_megarow_hot_key(spark):
    """Measured skew evidence in the regime partial aggregation CANNOT
    absorb: a shuffle JOIN with one hot key. Unlike a skewed groupBy —
    where map-side combine collapses the hot key to one partial row per
    map partition before the shuffle — a sort-merge join must move EVERY
    row of the hot key through one reducer; no combiner exists for join.
    With AQE's skew-join splitting disabled (the stream-static /
    non-adaptive regime salting exists for), the salted two-stage join
    must return exactly the unsalted result and beat its wall.

    Gated behind RUN_SLOW_BENCH=1 like the megarow agg benchmark above —
    wall-clock assertions on a shared box are flaky by nature; the small
    equality pin (test_salted_join_exact) stays in the default suite.
    """
    import os
    import statistics
    import time

    import pytest as _pytest

    if os.environ.get("RUN_SLOW_BENCH") != "1":
        _pytest.skip("set RUN_SLOW_BENCH=1 for the megarow join benchmark")

    from pyspark.sql import functions as F

    from ssg_etl_spark.operators.skew import salted_join

    n = 4_000_000
    n_keys = 10_000
    # 90% of the large side lands on key 0 — the single-reducer blowup:
    # unsalted, that key's rows sort and join in ONE task while every
    # other core idles; salted, the same rows spread over n_salts tasks.
    large = spark.range(0, n).select(
        F.when(F.col("id") % 10 != 0, F.lit(0))
        .otherwise(F.pmod(F.hash("id"), F.lit(n_keys)))
        .cast("bigint")
        .alias("k"),
        (F.col("id") % 1000).cast("double").alias("v"),
    ).persist()
    small = spark.range(0, n_keys).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 101).cast("double").alias("w")
    ).persist()
    large.count(), small.count()

    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # Force the pathological plan: no AQE skew splitting, no broadcast
        # (at real scale the small side is too big to broadcast; here we
        # pin the same shape explicitly).
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        def checksum(df):
            return df.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum((F.col("v") * F.col("w")).cast("decimal(28,6)")).alias("s"),
            ).collect()[0]

        def median_wall(fn, trials=3):
            walls = []
            for _ in range(trials):
                t0 = time.time()
                fn().write.mode("overwrite").format("noop").save()
                walls.append(time.time() - t0)
            return statistics.median(walls)

        unsalted_df = lambda: large.join(small, "k")  # noqa: E731
        salted_df = lambda: salted_join(large, small, "k", "v", n_salts=32)  # noqa: E731

        # Deterministic equality pin first (count + exact decimal dot sum).
        assert checksum(unsalted_df()) == checksum(salted_df())

        unsalted = median_wall(unsalted_df)
        salted = median_wall(salted_df)
        # The hot key is 2M rows through ONE reducer unsalted vs 32 salted
        # slices; require a real win, with shared-box slack.
        assert salted < unsalted, (salted, unsalted)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
        large.unpersist()
        small.unpersist()


def test_global_row_number_handles_null_prefix(spark):
    """NULL prefix values sort first (ascending NULLS FIRST) and keep their
    rows — the histogram join is null-safe."""
    import datetime as dt

    from pyspark.sql import functions as F

    from ssg_etl_spark.operators.analytics import global_row_number

    rows = [
        (None, 3),
        (dt.date(2020, 1, 2), 1),
        (None, 1),
        (dt.date(2021, 5, 1), 9),
        (dt.date(2020, 1, 2), 0),
    ]
    df = spark.createDataFrame(rows, "d date, id int")
    out = global_row_number(df, "d", ["id"], out_col="rn")
    got = [(r.d, r.id) for r in out.orderBy("rn").collect()]
    assert [r.rn for r in out.orderBy("rn").collect()] == [1, 2, 3, 4, 5]
    assert got == [
        (None, 1),
        (None, 3),
        (dt.date(2020, 1, 2), 0),
        (dt.date(2020, 1, 2), 1),
        (dt.date(2021, 5, 1), 9),
    ]
    assert out.filter(F.col("d").isNull()).count() == 2


def test_salted_plans_route_through_salt(spark):
    """r10 skew-sweep companion (tools/skew_sweep.py): the salted forms
    must actually ROUTE the shuffle through the salt — stage 1 of
    salted_sum_count exchanges on (keys…, _salt) before the final
    per-key exchange, and salted_join's equi-join keys include _salt with
    the small side exploded n_salts×. Values on the hostile fixture are
    pinned by the other tests; this pins the physical shape those wall/
    shuffle numbers came from."""
    import io
    from contextlib import redirect_stdout

    def plan_of(df):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    import re

    df = _skewed(spark)
    # Two shuffle rounds in order: first on (k, _salt) — the hot key's
    # rows physically spread n_salts ways — then the per-key final.
    agg_plan = plan_of(skew.salted_sum_count(df, ["k"], "v", spread="line_id"))
    parts = re.findall(r"hashpartitioning\(([^)]*)\)", agg_plan)
    assert len(parts) == 2, agg_plan
    assert "_salt" in parts[0] and "_salt" not in parts[1], agg_plan

    dim = spark.createDataFrame(
        [("HOT", "hot-dim"), ("cold", "cold-dim")], ["k", "label"]
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        join_plan = plan_of(skew.salted_join(df, dim, "k", spread="line_id"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # Small side replicated n_salts× via explode; the join itself keys on
    # (k, _salt): the hot key spreads 16 ways.
    assert "explode(" in join_plan, join_plan
    key_lines = [
        ln
        for ln in join_plan.splitlines()
        if ln.startswith("Left keys") or ln.startswith("Right keys")
    ]
    assert key_lines and all("_salt" in ln for ln in key_lines), join_plan
