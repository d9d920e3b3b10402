"""Cross-engine domain guards on the sketch family (r10 advice items):

* weighted log-bucket sketches FLOOR fractional weights on BOTH engines
  (a bare double->BIGINT cast truncates in Spark but rounds in DuckDB —
  the repo's own documented gotcha; 0.6 must not count as 1 in the
  oracle while Spark drops it);
* huge FINITE doubles (|x| >= 2^53 / 10^scale) are excluded from the
  fixed-point domain exactly like NaN/Inf — without the bound, one
  finite value produces three divergent behaviors (non-ANSI Spark
  clamps to Long.MAX, ANSI Spark throws, DuckDB errors);
* oracle-SQL group aliases that collide with the template's internal
  column names raise instead of generating ambiguous SQL;
* the bottom-k fast path persists its base scan once when it enters the
  dup-heavy doubling rounds (instead of re-scanning per round).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from ssg_etl_spark import cache
from ssg_etl_spark.operators import sketches


def _oracle_rows(parquet_path: str, sql: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW t AS SELECT * FROM "
        f"read_parquet('{parquet_path}/*.parquet')"
    )
    return sorted(map(tuple, con.execute(sql).fetchall()))


def test_fractional_weight_floors_identically_cross_engine(spark, tmp_path):
    """Weights 0.6 (floor 0 -> excluded), 1.7 (counts 1), 3.2 (counts 3),
    NaN / 2^53-and-above (excluded): Spark sketch quantiles and the
    DuckDB oracle replay agree value-for-value on a fractional weight
    column — the exact input class the r10 advice flagged as silently
    breaking bit-for-bit replay under a bare BIGINT cast."""
    rows = [
        (10.0, 0.6),  # floor 0 -> excluded on both engines
        (20.0, 1.7),  # counts once
        (30.0, 3.2),  # counts three times
        (40.0, float("nan")),  # excluded
        (50.0, float(2**53)),  # at the bound -> excluded
        (60.0, 2.0),  # counts twice
        (70.0, None),  # excluded
    ]
    df = spark.createDataFrame(rows, "x double, w double")
    path = os.path.join(str(tmp_path), "wfrac.parquet")
    df.coalesce(1).write.parquet(path)

    qs = (0.25, 0.5, 0.9)
    sk = sketches.logbucket_sketch(
        spark.read.parquet(path), "x", weight_col="w"
    )
    got = sorted(
        (r["q"], r["value_est"])
        for r in sketches.logbucket_quantiles(sk, qs).collect()
    )
    want = _oracle_rows(
        path,
        sketches.logbucket_quantiles_oracle_sql("t", "x", qs, weight_col="w"),
    )
    assert got == want

    # Defining identity still holds with floored weights: sketch equals
    # the expanded multiset {20:1, 30:3, 60:2}.
    expanded = spark.createDataFrame(
        [(20.0,)] + [(30.0,)] * 3 + [(60.0,)] * 2, "x double"
    )
    weighted = {
        (r["blo"], r["bhi"]): r["cnt"] for r in sk.collect()
    }
    plain = {
        (r["blo"], r["bhi"]): r["cnt"]
        for r in sketches.logbucket_sketch(expanded, "x").collect()
    }
    assert weighted == plain


def test_huge_finite_value_excluded_like_nan(spark, tmp_path):
    """A finite 1e300 is outside the fixed-point domain (|x| * 10^scale
    beyond int64): it must vanish from the sketch exactly like NaN/Inf,
    identically on both engines, leaving the finite bulk's buckets
    untouched — no Long.MAX clamp bucket, no ANSI crash."""
    finite = [1.25, 300.0, 300.0, -7.5]
    dirty = finite + [1e300, -1e300, float("inf"), float("nan")]
    df_dirty = spark.createDataFrame([(v,) for v in dirty], "x double")
    df_clean = spark.createDataFrame([(v,) for v in finite], "x double")

    d = {
        (r["blo"], r["bhi"]): r["cnt"]
        for r in sketches.logbucket_sketch(df_dirty, "x").collect()
    }
    c = {
        (r["blo"], r["bhi"]): r["cnt"]
        for r in sketches.logbucket_sketch(df_clean, "x").collect()
    }
    assert d == c
    assert sum(d.values()) == len(finite)

    # Cross-engine: the oracle applies the identical bound, so the
    # quantile outputs hash-match on the dirty input too.
    path = os.path.join(str(tmp_path), "huge.parquet")
    df_dirty.coalesce(1).write.parquet(path)
    qs = (0.5, 0.9)
    got = sorted(
        (r["q"], r["value_est"])
        for r in sketches.logbucket_quantiles(
            sketches.logbucket_sketch(spark.read.parquet(path), "x"), qs
        ).collect()
    )
    want = _oracle_rows(
        path, sketches.logbucket_quantiles_oracle_sql("t", "x", qs)
    )
    assert got == want


def test_boundary_of_fixed_point_domain(spark):
    """Values just inside the bound stay; at-or-above go. The bound is a
    single IEEE division both engines compare against bit-identically."""
    bound = sketches._fixed_point_bound(sketches.LOGBUCKET_SCALE)
    inside = bound * (1 - 1e-12)
    df = spark.createDataFrame(
        [(inside,), (bound,), (bound * 2,)], "x double"
    )
    sk = sketches.logbucket_sketch(df, "x").collect()
    assert sum(r["cnt"] for r in sk) == 1


def test_oracle_alias_collision_raises():
    """A group alias equal to an oracle-internal name (the advice's
    example: 'n') must raise, not emit ambiguous SQL."""
    with pytest.raises(ValueError, match="collide"):
        sketches.logbucket_quantiles_oracle_sql(
            "orders", "o_totalprice", (0.5,), {"n": "o_orderstatus"}
        )
    # Sanity: a non-colliding alias still builds.
    sql = sketches.logbucket_quantiles_oracle_sql(
        "orders", "o_totalprice", (0.5,), {"status": "o_orderstatus"}
    )
    assert "status" in sql


def test_bottomk_dup_heavy_persists_base_once(spark):
    """Dup-heavy input (50 distinct keys x 40 rows, k=32, oversample=1)
    forces the doubling rounds: the base scan must be registered with
    the tracked-cache exactly once, and the result is still the exact
    bottom-k distinct set."""
    import hashlib

    rows = [(f"u{i % 50}",) for i in range(2000)]
    df = spark.createDataFrame(rows, "key string")
    before = cache.tracked_count()
    sk = sketches.bottomk_sketch(df, "key", k=32, oversample=1, max_rounds=3)
    got = sorted((r["h"], r["key"]) for r in sk.collect())
    assert cache.tracked_count() == before + 1

    want = sorted(
        (hashlib.md5(f"u{i}".encode()).hexdigest(), f"u{i}")
        for i in range(50)
    )[:32]
    assert got == want
    cache.release_tracked()
