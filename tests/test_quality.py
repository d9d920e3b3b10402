"""Expectation engine: GE-suite port evaluated in one pass."""

from __future__ import annotations

from ssg_etl_spark.operators import quality as Q
from ssg_etl_spark.sources.tables import load_table


def test_suite_on_part(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    results = Q.run_suite(
        part,
        [
            Q.expect_unique("p_partkey"),
            Q.expect_not_null("p_partkey"),
            Q.expect_not_null("p_name"),
            Q.expect_between("p_size", 0, 1000),
            Q.expect_max_between("p_size", 1, 1000),
            Q.expect_row_count_between(1, 10_000_000),
        ],
    )
    assert Q.suite_passed(results), [r for r in results if not r["passed"]]


def test_failing_expectation_detected(spark, sf_dir):
    part = load_table(spark, sf_dir, "part")
    results = Q.run_suite(part, [Q.expect_between("p_retailprice", 0, 1)])
    assert not Q.suite_passed(results)
    assert results[0]["metrics"]  # observed metrics surfaced for triage


def test_mostly_threshold(spark):
    df = spark.createDataFrame([(1,), (2,), (None,)], ["x"])
    ok = Q.run_suite(df, [Q.expect_not_null("x", mostly=0.6)])
    strict = Q.run_suite(df, [Q.expect_not_null("x", mostly=0.99)])
    assert Q.suite_passed(ok) and not Q.suite_passed(strict)


def test_scalar_bounds_vacuously_pass_on_empty(spark):
    """min/max/mean bounds assert nothing on an empty or all-NULL column
    (GE semantics, consistent with the mostly-style expectations); pairing
    with a row-count floor restores strictness."""
    empty = spark.createDataFrame([], "x int")
    nulls = spark.createDataFrame([(None,), (None,)], "x int")
    suite = [
        Q.expect_min_between("x", 0, 10),
        Q.expect_max_between("x", 0, 10),
        Q.expect_mean_between("x", 0, 10),
    ]
    assert Q.suite_passed(Q.run_suite(empty, suite))
    assert Q.suite_passed(Q.run_suite(nulls, suite))
    assert not Q.suite_passed(
        Q.run_suite(empty, suite + [Q.expect_row_count_between(1, 10)])
    )
    # Non-empty out-of-bounds still fails.
    bad = spark.createDataFrame([(99,)], "x int")
    assert not Q.suite_passed(Q.run_suite(bad, [Q.expect_min_between("x", 0, 10)]))


def test_same_column_same_type_expectations_do_not_collide(spark):
    from ssg_etl_spark.operators.quality import expect_between, run_suite

    df = spark.createDataFrame([(500,), (600,)], "x int")
    results = run_suite(df, [expect_between("x", 0, 10), expect_between("x", 0, 1000)])
    assert [r["passed"] for r in results] == [False, True]


def test_regex_min_distinct_expectations(spark):
    from ssg_etl_spark.operators import quality as Q

    df = spark.createDataFrame(
        [("SKU-1", 5), ("SKU-2", 9), ("bad", 3), (None, 7)],
        "code string, qty int",
    )
    results = {
        r["name"]: r["passed"]
        for r in Q.run_suite(
            df,
            [
                Q.expect_regex("code", r"^SKU-\d+$"),           # 2/3 match
                Q.expect_regex("code", r"^SKU-\d+$", mostly=0.6),
                Q.expect_min_between("qty", 1, 4),
                Q.expect_min_between("qty", 4, 9),
                Q.expect_distinct_count_between("code", 3, 3),  # nulls excluded
                Q.expect_distinct_count_between("code", 4, 9),
            ],
        )
    }
    assert results == {
        "regex(code, '^SKU-\\\\d+$', mostly=1.0)": False,
        "regex(code, '^SKU-\\\\d+$', mostly=0.6)": True,
        "min_between(qty, 1, 4)": True,
        "min_between(qty, 4, 9)": False,
        "distinct_count_between(code, 3, 3)": True,
        "distinct_count_between(code, 4, 9)": False,
    }
