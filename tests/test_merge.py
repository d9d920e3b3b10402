"""Merge / change-detection / SCD2 operator semantics on small frames."""

from __future__ import annotations

from ssg_etl_spark.operators import merge as M


def _df(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_merge_upsert_source_wins(spark):
    target = _df(spark, [(1, "a", 10.0), (2, "b", 20.0)], ["k", "name", "bal"])
    source = _df(spark, [(2, "b2", 99.0), (3, "c", 30.0)], ["k", "name", "bal"])
    out = {r.k: (r.name, r.bal) for r in M.merge_upsert(target, source, ["k"]).collect()}
    assert out == {1: ("a", 10.0), 2: ("b2", 99.0), 3: ("c", 30.0)}


def test_merge_upsert_null_value_overwrites(spark):
    target = _df(spark, [(1, "a")], "k int, name string")
    source = _df(spark, [(1, None)], "k int, name string")
    out = M.merge_upsert(target, source, ["k"]).collect()
    assert out[0].name is None  # row-level winner: source NULL wins


def test_detect_changes_classifies(spark):
    target = _df(spark, [(1, "a"), (2, "b")], ["k", "v"])
    source = _df(spark, [(1, "a"), (2, "B"), (3, "c")], ["k", "v"])
    out = {(r.k): r.change_type for r in M.detect_changes(target, source, ["k"]).collect()}
    assert out == {2: "update", 3: "insert"}  # unchanged row 1 absent


def test_scd2_versions(spark):
    current = _df(
        spark,
        [(1, "a", "2020-01-01", None, True), (2, "b", "2020-01-01", None, True)],
        "k int, v string, valid_from string, valid_to string, is_current boolean",
    ).selectExpr(
        "k", "v", "cast(valid_from as date) valid_from",
        "cast(valid_to as date) valid_to", "is_current",
    )
    updates = _df(spark, [(1, "a2"), (2, "b")], ["k", "v"])  # 1 changes, 2 no-op
    out = M.scd2_apply(current, updates, ["k"], ["v"], "2024-01-01")
    rows = sorted(
        [(r.k, r.v, str(r.valid_from), str(r.valid_to), r.is_current) for r in out.collect()]
    )
    assert rows == [
        (1, "a", "2020-01-01", "2024-01-01", False),   # expired
        (1, "a2", "2024-01-01", "None", True),          # new version
        (2, "b", "2020-01-01", "None", True),           # untouched no-op
    ]


def test_merge_upsert_null_key_component(spark):
    target = _df(spark, [(None, "old")], "k int, name string")
    source = _df(spark, [(None, "new")], "k int, name string")
    out = M.merge_upsert(target, source, ["k"]).collect()
    assert len(out) == 1 and out[0].name == "new"  # NULL keys match; source wins


def test_scd2_inserts_new_keys(spark):
    current = _df(
        spark,
        [(1, "a", "2020-01-01", None, True)],
        "k int, v string, valid_from string, valid_to string, is_current boolean",
    ).selectExpr(
        "k", "v", "cast(valid_from as date) valid_from",
        "cast(valid_to as date) valid_to", "is_current",
    )
    updates = _df(spark, [(2, "brand-new")], ["k", "v"])
    out = M.scd2_apply(current, updates, ["k"], ["v"], "2024-01-01")
    rows = sorted((r.k, r.v, str(r.valid_from), r.is_current) for r in out.collect())
    assert rows == [
        (1, "a", "2020-01-01", True),
        (2, "brand-new", "2024-01-01", True),
    ]


def test_scd2_duplicate_update_keys_single_current(spark):
    current = _df(
        spark,
        [(1, "a", "2020-01-01", None, True)],
        "k int, v string, valid_from string, valid_to string, is_current boolean",
    ).selectExpr(
        "k", "v", "cast(valid_from as date) valid_from",
        "cast(valid_to as date) valid_to", "is_current",
    )
    updates = _df(spark, [(1, "x"), (1, "x")], ["k", "v"])
    out = M.scd2_apply(current, updates, ["k"], ["v"], "2024-01-01")
    current_rows = [r for r in out.collect() if r.is_current]
    assert len(current_rows) == 1  # invariant: one current version per key


def test_merge_upsert_preserves_target_column_order(spark):
    target = _df(spark, [("a", 1, 10.0)], ["name", "k", "bal"])
    source = _df(spark, [("b", 2, 20.0)], ["name", "k", "bal"])
    out = M.merge_upsert(target, source, ["k"])
    assert out.columns == ["name", "k", "bal"]  # drop-in target rewrite


def test_detect_changes_null_key_is_update(spark):
    target = _df(spark, [(None, "x")], "k int, v string")
    source = _df(spark, [(None, "y")], "k int, v string")
    out = M.detect_changes(target, source, ["k"]).collect()
    assert [(r.k, r.v, r.change_type) for r in out] == [(None, "y", "update")]


def test_detect_changes_aligns_columns_by_name(spark):
    target = _df(spark, [(1, "a", "b")], ["k", "created_by", "updated_by"])
    source = spark.createDataFrame(
        [(1, "b", "a")], ["k", "updated_by", "created_by"]
    )  # same values, different column order
    assert M.detect_changes(target, source, ["k"]).count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        M.detect_changes(target, source.drop("updated_by"), ["k"])
