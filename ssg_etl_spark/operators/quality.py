"""Data-quality expectation engine (SURVEY §5).

Port of the reference's two assertion families as first-class DataFrame
operators:
* pytest checks (scripts/Python_ETL/product/test_product_pipeline.py:9-46):
  column exists, no nulls, uniqueness, dtype, range, domain set;
* Great Expectations suites (GreatExpectations/dimproducts_suite.json):
  unique / not_null (with ``mostly``), value_set, max-between,
  mean-between, row-count.

Each expectation compiles to Column expressions evaluated in ONE aggregate
pass per DataFrame (``run_suite`` merges them), so a 100 TB validation is a
single scan — not one job per expectation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One declarative check: aggregate expressions + a verdict function."""

    name: str
    aggs: dict[str, Column]  # alias -> aggregate expression
    verdict: Any  # callable: dict[str, value] -> bool


def expect_not_null(col: str, mostly: float = 1.0) -> Expectation:
    a = {
        f"{col}__nonnull": F.count(col),
        f"{col}__total": F.count(F.lit(1)),
    }
    return Expectation(
        f"not_null({col}, mostly={mostly})",
        a,
        lambda m: m[f"{col}__total"] == 0
        or m[f"{col}__nonnull"] / m[f"{col}__total"] >= mostly,
    )


def expect_unique(col: str) -> Expectation:
    a = {
        f"{col}__distinct": F.countDistinct(col),
        f"{col}__nonnull": F.count(col),
    }
    return Expectation(
        f"unique({col})", a, lambda m: m[f"{col}__distinct"] == m[f"{col}__nonnull"]
    )


def expect_in_set(col: str, values: list, mostly: float = 1.0) -> Expectation:
    hit = F.sum(F.col(col).isin(values).cast("long"))
    a = {f"{col}__inset": hit, f"{col}__nonnull": F.count(col)}
    return Expectation(
        f"in_set({col})",
        a,
        lambda m: m[f"{col}__nonnull"] == 0
        or (m[f"{col}__inset"] or 0) / m[f"{col}__nonnull"] >= mostly,
    )


def expect_between(col: str, lo, hi, mostly: float = 1.0) -> Expectation:
    hit = F.sum(F.col(col).between(lo, hi).cast("long"))
    a = {f"{col}__between": hit, f"{col}__nonnull": F.count(col)}
    return Expectation(
        f"between({col}, {lo}, {hi})",
        a,
        lambda m: m[f"{col}__nonnull"] == 0
        or (m[f"{col}__between"] or 0) / m[f"{col}__nonnull"] >= mostly,
    )


# The scalar-bound expectations pass VACUOUSLY on an empty or all-NULL
# column (nonnull == 0), matching the mostly-style expectations above and
# Great Expectations semantics — a no-rows input asserts nothing. A strict
# "must have data" check composes as expect_row_count_between(1, ...).
def expect_max_between(col: str, lo, hi) -> Expectation:
    a = {f"{col}__max": F.max(col), f"{col}__nonnull": F.count(col)}
    return Expectation(
        f"max_between({col}, {lo}, {hi})",
        a,
        lambda m: m[f"{col}__nonnull"] == 0 or lo <= m[f"{col}__max"] <= hi,
    )


def expect_mean_between(col: str, lo, hi) -> Expectation:
    a = {f"{col}__mean": F.avg(col), f"{col}__nonnull": F.count(col)}
    return Expectation(
        f"mean_between({col}, {lo}, {hi})",
        a,
        lambda m: m[f"{col}__nonnull"] == 0 or lo <= m[f"{col}__mean"] <= hi,
    )


def expect_regex(col: str, pattern: str, mostly: float = 1.0) -> Expectation:
    """values_to_match_regex: share of non-null values matching ``pattern``."""
    hit = F.sum(F.col(col).rlike(pattern).cast("long"))
    a = {f"{col}__regex": hit, f"{col}__nonnull": F.count(col)}
    return Expectation(
        f"regex({col}, {pattern!r}, mostly={mostly})",
        a,
        lambda m: m[f"{col}__nonnull"] == 0
        or (m[f"{col}__regex"] or 0) / m[f"{col}__nonnull"] >= mostly,
    )


def expect_min_between(col: str, lo, hi) -> Expectation:
    a = {f"{col}__min": F.min(col), f"{col}__nonnull": F.count(col)}
    return Expectation(
        f"min_between({col}, {lo}, {hi})",
        a,
        lambda m: m[f"{col}__nonnull"] == 0 or lo <= m[f"{col}__min"] <= hi,
    )


def expect_distinct_count_between(col: str, lo: int, hi: int) -> Expectation:
    a = {f"{col}__ndv": F.countDistinct(col)}
    return Expectation(
        f"distinct_count_between({col}, {lo}, {hi})",
        a,
        lambda m: lo <= m[f"{col}__ndv"] <= hi,
    )


def expect_row_count_between(lo: int, hi: int) -> Expectation:
    a = {"__rowcount": F.count(F.lit(1))}
    return Expectation(
        f"row_count_between({lo}, {hi})", a, lambda m: lo <= m["__rowcount"] <= hi
    )


def run_suite(df: DataFrame, expectations: list[Expectation]) -> list[dict]:
    """Evaluate every expectation in ONE aggregation pass over ``df``.

    Returns [{name, passed, metrics}]; raises nothing — callers decide
    whether failures abort (the reference's GE checkpoint raises; its pytest
    suite asserts)."""
    if not expectations:
        return []
    # Aliases are namespaced per expectation index so two same-type checks
    # on the same column (different parameters) never collide.
    merged: dict[str, Column] = {}
    remap: list[dict[str, str]] = []
    for i, e in enumerate(expectations):
        m = {}
        for k, c in e.aggs.items():
            uk = f"e{i}__{k}"
            merged[uk] = c
            m[k] = uk
        remap.append(m)
    row = df.agg(*[c.alias(k) for k, c in merged.items()]).first().asDict()
    results = []
    for e, m in zip(expectations, remap):
        metrics = {k: row[uk] for k, uk in m.items()}
        results.append(
            {"name": e.name, "passed": bool(e.verdict(metrics)), "metrics": metrics}
        )
    return results


def suite_passed(results: list[dict]) -> bool:
    return all(r["passed"] for r in results)
