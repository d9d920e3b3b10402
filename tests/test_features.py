"""Feature-engineering operators: sequence features, target encoding,
robust MAD outliers (ssg_etl_spark/operators/features.py)."""

from __future__ import annotations

import datetime

import pytest

from ssg_etl_spark.operators import features


def _hist(spark):
    rows = [
        # key, time, id, value
        ("a", datetime.date(2024, 1, 1), 1, 10.0),
        ("a", datetime.date(2024, 1, 4), 2, 20.0),
        ("a", datetime.date(2024, 1, 4), 3, 30.0),  # tie on time → id order
        ("a", datetime.date(2024, 2, 1), 4, 40.0),
        ("b", datetime.date(2024, 1, 1), 5, 5.0),
    ]
    return spark.createDataFrame(
        rows, "k string, t date, id int, v double"
    )


def test_sequence_features_values(spark):
    out = features.sequence_features(
        _hist(spark), "k", "t", "id", "v", rolling_n=3
    )
    got = {r["id"]: r.asDict() for r in out.collect()}
    assert [got[i]["event_seq"] for i in (1, 2, 3, 4)] == [1, 2, 3, 4]
    assert got[1]["days_since_prev"] is None
    assert got[2]["days_since_prev"] == 3
    assert got[3]["days_since_prev"] == 0  # tiebreak on id, same day
    assert got[4]["days_since_prev"] == 28
    # trailing-3 means: [10], [10,20], [10,20,30], [20,30,40]
    assert [got[i]["rolling_avg"] for i in (1, 2, 3, 4)] == [
        10.0, 15.0, 20.0, 30.0,
    ]
    assert got[4]["cum_value"] == 100.0
    assert got[5]["event_seq"] == 1 and got[5]["cum_value"] == 5.0


def test_target_encoding_shrinks_rare_categories(spark):
    # cat "big": 8 rows of 100; cat "rare": 2 rows of 0. global mean = 80.
    rows = [("big", 100.0)] * 8 + [("rare", 0.0)] * 2
    df = spark.createDataFrame(rows, "cat string, y double")
    enc = {
        r["cat"]: r["enc"]
        for r in features.target_encoding_table(
            df, "cat", "y", smoothing=2.0
        ).collect()
    }
    # big: (800 + 2*80) / (8+2) = 96 ; rare: (0 + 2*80) / (2+2) = 40
    assert enc["big"] == pytest.approx(96.0)
    assert enc["rare"] == pytest.approx(40.0)  # pulled far toward 80


def test_apply_target_encoding_unseen_category_null(spark):
    df = spark.createDataFrame([("big", 1.0)], "cat string, y double")
    enc = features.target_encoding_table(df, "cat", "y", smoothing=1.0)
    fresh = spark.createDataFrame(
        [("big", 9.0), ("unseen", 9.0)], "cat string, y double"
    )
    out = {r["cat"]: r["enc"] for r in
           features.apply_target_encoding(fresh, enc, "cat").collect()}
    assert out["big"] is not None and out["unseen"] is None


def test_robust_outliers_flags_planted_point(spark):
    vals = [float(v) for v in (10, 11, 12, 13, 14, 15, 16, 1000)]
    df = spark.createDataFrame(
        [("g", i, v) for i, v in enumerate(vals)],
        "grp string, id int, x double",
    )
    out = {r["id"]: r.asDict() for r in features.robust_outliers(
        df, "grp", "x").collect()}
    assert out[7]["is_outlier"] is True and out[7]["robust_z"] > 3.5
    assert all(not out[i]["is_outlier"] for i in range(7))


def test_robust_outliers_degenerate_and_null_groups(spark):
    rows = (
        # constant group: MAD = 0 → NULL z, never flagged
        [("const", i, 5.0) for i in range(6)]
        # NULL value rides through as NULL z / not-outlier
        + [("const", 99, None)]
    )
    df = spark.createDataFrame(rows, "grp string, id int, x double")
    out = features.robust_outliers(df, "grp", "x").collect()
    assert all(r["robust_z"] is None for r in out)
    assert all(r["is_outlier"] is False for r in out)


def test_robust_outliers_approx_mode_close_to_exact(spark):
    import random

    rng = random.Random(7)
    rows = [("g", i, rng.gauss(0, 1)) for i in range(500)]
    rows.append(("g", 999, 50.0))
    df = spark.createDataFrame(rows, "grp string, id int, x double")
    exact = {r["id"]: r["robust_z"] for r in features.robust_outliers(
        df, "grp", "x", exact=True).collect()}
    approx = {r["id"]: r["robust_z"] for r in features.robust_outliers(
        df, "grp", "x", exact=False).collect()}
    assert approx[999] > 3.5
    # t-digest medians drift only slightly at this size
    assert abs(exact[999] - approx[999]) / exact[999] < 0.05
