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
    """One declarative check: aggregate expressions + a verdict function.

    ``needs_schema`` marks structural checks (column-exists, dtype): their
    verdicts receive ``__columns`` / ``__dtypes`` keys from the DataFrame
    schema instead of (or beside) aggregate metrics — no scan needed.
    """

    name: str
    aggs: dict[str, Column]  # alias -> aggregate expression
    verdict: Any  # callable: dict[str, value] -> bool
    needs_schema: bool = False


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


def _bounded(col: str, lo, hi) -> Column:
    """GE one-sided-bound semantics: a NULL/absent bound means unbounded
    on that side (``{"min_value": 0, "max_value": null}`` is GE's normal
    way to say "at least 0"). ``col.between(lo, NULL)`` would instead be
    three-valued NULL for every in-range value — which the dead-letter
    gates coalesce to FAILED, quarantining 100% of rows (r9 review
    finding)."""
    conds = []
    if lo is not None:
        conds.append(F.col(col) >= F.lit(lo))
    if hi is not None:
        conds.append(F.col(col) <= F.lit(hi))
    if not conds:
        return F.lit(True)
    pred = conds[0]
    for c in conds[1:]:
        pred = pred & c
    return pred


def expect_between(col: str, lo, hi, mostly: float = 1.0) -> Expectation:
    hit = F.sum(_bounded(col, lo, hi).cast("long"))
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
def _in_bounds(x, lo, hi) -> bool:
    """Python twin of :func:`_bounded`: NULL/None bound = unbounded."""
    return (lo is None or x >= lo) and (hi is None or x <= hi)


def expect_max_between(col: str, lo, hi) -> Expectation:
    a = {f"{col}__max": F.max(col), f"{col}__nonnull": F.count(col)}
    return Expectation(
        f"max_between({col}, {lo}, {hi})",
        a,
        lambda m: m[f"{col}__nonnull"] == 0 or _in_bounds(m[f"{col}__max"], lo, hi),
    )


def expect_mean_between(col: str, lo, hi) -> Expectation:
    a = {f"{col}__mean": F.avg(col), f"{col}__nonnull": F.count(col)}
    return Expectation(
        f"mean_between({col}, {lo}, {hi})",
        a,
        lambda m: m[f"{col}__nonnull"] == 0
        or _in_bounds(m[f"{col}__mean"], lo, hi),
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
        lambda m: m[f"{col}__nonnull"] == 0
        or _in_bounds(m[f"{col}__min"], lo, hi),
    )


def expect_distinct_count_between(col: str, lo: int, hi: int) -> Expectation:
    a = {f"{col}__ndv": F.countDistinct(col)}
    return Expectation(
        f"distinct_count_between({col}, {lo}, {hi})",
        a,
        lambda m: _in_bounds(m[f"{col}__ndv"], lo, hi),
    )


def expect_row_count_between(lo: int, hi: int) -> Expectation:
    a = {"__rowcount": F.count(F.lit(1))}
    return Expectation(
        f"row_count_between({lo}, {hi})",
        a,
        lambda m: _in_bounds(m["__rowcount"], lo, hi),
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
    row = (
        df.agg(*[c.alias(k) for k, c in merged.items()]).first().asDict()
        if merged
        else {}
    )
    schema_metrics = {
        "__columns": list(df.columns),
        "__dtypes": dict(df.dtypes),
    }
    results = []
    for e, m in zip(expectations, remap):
        metrics = {k: row[uk] for k, uk in m.items()}
        if e.needs_schema:
            metrics = {**metrics, **schema_metrics}
        results.append(
            {"name": e.name, "passed": bool(e.verdict(metrics)), "metrics": metrics}
        )
    return results


def suite_passed(results: list[dict]) -> bool:
    return all(r["passed"] for r in results)


def expect_column_exists(col: str) -> Expectation:
    """Structural check: ``col`` is in the DataFrame schema (no scan)."""
    return Expectation(
        f"column_exists({col})",
        {},
        lambda m: col in m["__columns"],
        needs_schema=True,
    )


# GE type_list entries seen in the wild mix pandas dtypes, SQL names, and
# Python names; Spark's df.dtypes speaks Spark SQL. Normalize both sides to
# a canonical Spark name before comparing.
_TYPE_ALIASES = {
    "int": "int", "int32": "int", "integer": "int",
    "int64": "bigint", "bigint": "bigint", "long": "bigint",
    "int16": "smallint", "smallint": "smallint",
    "int8": "tinyint", "tinyint": "tinyint",
    "float": "float", "float32": "float",
    "float64": "double", "double": "double",
    "str": "string", "string": "string", "varchar": "string",
    "text": "string", "object": "string",
    "bool": "boolean", "boolean": "boolean",
    "date": "date",
    "datetime": "timestamp", "datetime64[ns]": "timestamp",
    "timestamp": "timestamp",
}


def _canon_type(name: str) -> str:
    n = name.strip().lower()
    if n.startswith("decimal"):
        return "decimal"
    return _TYPE_ALIASES.get(n, n)


def expect_type_in(col: str, type_list: list[str]) -> Expectation:
    """Structural check: ``col``'s Spark SQL type is in ``type_list``
    (GE's expect_column_values_to_be_in_type_list; alias-normalized)."""
    wanted = {_canon_type(t) for t in type_list}
    return Expectation(
        f"type_in({col}, {sorted(wanted)})",
        {},
        lambda m: col in m["__dtypes"]
        and _canon_type(m["__dtypes"][col]) in wanted,
        needs_schema=True,
    )


# expectation_type -> builder over the GE kwargs dict. Covers every type
# the reference's committed suites use (adv_suite.json,
# dimproducts_suite.json) plus the between/regex/ndv family the code-level
# constructors already expose.
_GE_BUILDERS = {
    "expect_column_to_exist": lambda k: expect_column_exists(k["column"]),
    "expect_column_values_to_be_unique": lambda k: expect_unique(k["column"]),
    "expect_column_values_to_not_be_null": lambda k: expect_not_null(
        k["column"], k.get("mostly", 1.0)
    ),
    "expect_column_values_to_be_in_set": lambda k: expect_in_set(
        k["column"], k["value_set"], k.get("mostly", 1.0)
    ),
    "expect_column_values_to_be_between": lambda k: expect_between(
        k["column"], k.get("min_value"), k.get("max_value"),
        k.get("mostly", 1.0)
    ),
    "expect_column_values_to_match_regex": lambda k: expect_regex(
        k["column"], k["regex"], k.get("mostly", 1.0)
    ),
    "expect_column_values_to_be_in_type_list": lambda k: expect_type_in(
        k["column"], k["type_list"]
    ),
    "expect_column_max_to_be_between": lambda k: expect_max_between(
        k["column"], k.get("min_value"), k.get("max_value")
    ),
    "expect_column_min_to_be_between": lambda k: expect_min_between(
        k["column"], k.get("min_value"), k.get("max_value")
    ),
    "expect_column_mean_to_be_between": lambda k: expect_mean_between(
        k["column"], k.get("min_value"), k.get("max_value")
    ),
    "expect_column_unique_value_count_to_be_between": lambda k:
        expect_distinct_count_between(
            k["column"], k.get("min_value"), k.get("max_value")
        ),
    "expect_table_row_count_to_equal": lambda k: expect_row_count_between(
        k["value"], k["value"]
    ),
    "expect_table_row_count_to_be_between": lambda k: expect_row_count_between(
        k.get("min_value"), k.get("max_value")
    ),
}


def load_ge_suite(suite: dict) -> list[Expectation]:
    """Compile a Great-Expectations suite DICT (the reference stores these
    as data: …/GreatExpectations/great_expectations/expectations/
    adv_suite.json, dimproducts_suite.json) into this module's
    ``Expectation`` list — suites authored for the reference's GE
    checkpoints run unchanged through :func:`run_suite`'s single-scan
    evaluation.

    Unknown expectation types raise (a silently skipped check is a
    validation hole, the one failure mode a quality gate must not have).
    """
    exps = []
    for item in suite.get("expectations", []):
        etype = item["expectation_type"]
        if etype not in _GE_BUILDERS:
            raise ValueError(
                f"unsupported expectation_type {etype!r}; supported: "
                f"{sorted(_GE_BUILDERS)}"
            )
        exps.append(_GE_BUILDERS[etype](item.get("kwargs", {})))
    return exps


def load_ge_suite_file(path: str) -> list[Expectation]:
    """:func:`load_ge_suite` over a suite JSON file on disk."""
    import json

    with open(path) as f:
        return load_ge_suite(json.load(f))


# GE's column-map expectation types — the ones with a per-ROW verdict a
# dead-letter stream can gate on. GE row semantics: value expectations
# evaluate NON-NULL values only (a NULL row is not "out of set"; nullness
# is expect_column_values_to_not_be_null's job), so every predicate below
# except not_be_null explicitly passes NULLs.
_GE_ROW_PREDICATES = {
    "expect_column_values_to_not_be_null": lambda k: F.col(
        k["column"]
    ).isNotNull(),
    "expect_column_values_to_be_in_set": lambda k: F.col(k["column"]).isNull()
    | F.col(k["column"]).isin(k["value_set"]),
    "expect_column_values_to_be_between": lambda k: F.col(
        k["column"]
    ).isNull()
    | _bounded(k["column"], k.get("min_value"), k.get("max_value")),
    "expect_column_values_to_match_regex": lambda k: F.col(
        k["column"]
    ).isNull()
    | F.col(k["column"]).rlike(k["regex"]),
}


def ge_suite_split_row_rules(
    suite: dict, suite_name: str
) -> tuple[dict[str, Column], list[Expectation]]:
    """Split a GE suite dict into the streaming dead-letter gate's two
    halves: ``(row_rules, batch_expectations)``.

    ``row_rules`` maps ``"<suite>/<type>(<column>)"`` → boolean Column for
    every column-map expectation (the per-row verdicts that can quarantine
    individual rows — quarantine rows then CARRY the suite/expectation
    name). ``mostly`` is intentionally not applied at the row level: it is
    a suite-verdict tolerance, while a dead-letter gate routes each
    failing row — the suite-level ``mostly`` check still runs among
    ``batch_expectations``. Everything without a row verdict (unique,
    aggregates, row counts, structural checks) compiles to the normal
    :class:`Expectation` list for per-batch :func:`run_suite` evaluation.
    Unknown types raise, exactly as :func:`load_ge_suite`.
    """
    row_rules: dict[str, Column] = {}
    batch_exps: list[Expectation] = []
    for item in suite.get("expectations", []):
        etype = item["expectation_type"]
        kwargs = item.get("kwargs", {})
        if etype in _GE_ROW_PREDICATES:
            name = f"{suite_name}/{etype}({kwargs.get('column')})"
            row_rules[name] = _GE_ROW_PREDICATES[etype](kwargs)
        if etype not in _GE_BUILDERS:
            raise ValueError(
                f"unsupported expectation_type {etype!r}; supported: "
                f"{sorted(_GE_BUILDERS)}"
            )
        batch_exps.append(_GE_BUILDERS[etype](kwargs))
    return row_rules, batch_exps


def profile_drift(
    current: DataFrame,
    baseline: DataFrame,
    numeric_cols: list[str],
) -> DataFrame:
    """Snapshot-over-snapshot data-drift report: for each numeric column,
    compare row count, null rate, mean, min, and max between a baseline
    load and the current one — the check that catches a silently broken
    upstream feed (nulls spiking, a unit change shifting the mean) before
    it lands in the warehouse. Complements the expectation suite: suites
    assert absolute bounds, drift compares RELATIVE to the last known-good
    load.

    One single-pass aggregation per snapshot (every metric is a partial-
    aggregable expression; means go through DECIMAL so the report is
    order-independent), melted to one row per (column, metric) and joined
    on the metric key — two scans total, output size O(columns), never
    O(rows).
    """
    def profile(df: DataFrame, side: str) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias("row_count")]
        for c in numeric_cols:
            aggs += [
                F.round(
                    F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                    / F.count(F.lit(1)).cast("double"),
                    6,
                ).alias(f"{c}__null_rate"),
                F.round(
                    F.sum(F.col(c).cast("decimal(28,8)")).cast("double")
                    / F.sum(F.when(F.col(c).isNotNull(), 1).otherwise(0)).cast(
                        "double"
                    ),
                    6,
                ).alias(f"{c}__mean"),
                F.round(F.min(c).cast("double"), 6).alias(f"{c}__min"),
                F.round(F.max(c).cast("double"), 6).alias(f"{c}__max"),
            ]
        wide = df.agg(*aggs)
        metrics = [f"{c}__{m}" for c in numeric_cols
                   for m in ("null_rate", "mean", "min", "max")]
        pairs = [
            x
            for m in ["row_count", *metrics]
            for x in (F.lit(m), F.col(m).cast("double"))
        ]
        return wide.select(
            F.explode(F.create_map(*pairs)).alias("metric", side)
        )

    cur = profile(current, "current_value")
    base = profile(baseline, "baseline_value")
    return cur.join(base, "metric", "full").select(
        "metric",
        "baseline_value",
        "current_value",
        F.round(F.col("current_value") - F.col("baseline_value"), 6).alias(
            "delta"
        ),
        F.when(
            F.col("baseline_value").isNotNull()
            & (F.col("baseline_value") != 0),
            F.round(
                (F.col("current_value") - F.col("baseline_value"))
                / F.abs(F.col("baseline_value")),
                6,
            ),
        ).alias("rel_change"),
    )


def load_ge_checkpoint_file(path: str) -> dict:
    """Parse a Great-Expectations CHECKPOINT YAML (the wrapper binding a
    datasource asset to a suite plus an action list — reference:
    …/great_expectations/checkpoints/adv_checkpoint.yml) into the parts
    this engine executes: ``{"name", "validations": [{"suite_name",
    "data_asset_name"}]}``.

    GE's action list (store results, rebuild data docs) is its own
    warehouse plumbing; the engine's equivalents are the audit sink and
    alerts modules, so actions are intentionally not interpreted here.
    A checkpoint whose validations name no suite (nor a top-level
    ``expectation_suite_name`` fallback) raises — a checkpoint that
    validates nothing is a configuration error, not a pass.
    """
    import yaml

    with open(path) as f:
        cp = yaml.safe_load(f)
    fallback_suite = cp.get("expectation_suite_name")
    validations = []
    for v in cp.get("validations") or []:
        suite = v.get("expectation_suite_name") or fallback_suite
        if not suite:
            raise ValueError(
                f"checkpoint {cp.get('name')!r}: validation without an "
                "expectation_suite_name"
            )
        br = v.get("batch_request") or {}
        validations.append(
            {"suite_name": suite, "data_asset_name": br.get("data_asset_name")}
        )
    if not validations:
        raise ValueError(
            f"checkpoint {cp.get('name')!r} has no validations to run"
        )
    return {"name": cp.get("name"), "validations": validations}


def run_checkpoint(
    checkpoint_path: str,
    suites_dir: str,
    frames: dict[str, DataFrame],
) -> list[dict]:
    """Execute a GE checkpoint end-to-end: for each validation, load
    ``<suites_dir>/<suite_name>.json`` (:func:`load_ge_suite_file`) and
    evaluate it against the DataFrame bound to its data asset name
    (``frames[data_asset_name]`` — the engine's stand-in for GE's
    datasource/data-connector resolution, which binds to live
    warehouses). One aggregation scan per validated frame
    (:func:`run_suite`); returns the flat result rows with
    checkpoint/suite/asset attached. An asset with no bound frame raises
    — silently skipping a validation is the one failure mode a quality
    gate must not have.
    """
    import os

    cp = load_ge_checkpoint_file(checkpoint_path)
    results = []
    for v in cp["validations"]:
        asset = v["data_asset_name"]
        if asset not in frames:
            raise KeyError(
                f"checkpoint {cp['name']!r}: no DataFrame bound for data "
                f"asset {asset!r} (bound: {sorted(frames)})"
            )
        exps = load_ge_suite_file(
            os.path.join(suites_dir, v["suite_name"] + ".json")
        )
        for res in run_suite(frames[asset], exps):
            results.append(
                {
                    "checkpoint": cp["name"],
                    "suite": v["suite_name"],
                    "data_asset": asset,
                    **res,
                }
            )
    return results
