"""Scalar column helpers — the engine's F1-F12 surface (SURVEY §2.8).

The reference implements these as T-SQL CASE chains (dags/ssg_gl_etl.py:297-320),
per-field Python coercion shims (dags/hanger_lane.py:380-433), and pandas
fillna batteries (dags/automate_etl_with_airflow.py:81-93). Here they are
pure Column expressions so they stay inside whole-stage codegen — no UDFs.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F


def case_map(col: Column, mapping: Mapping[object, object], default: object = None) -> Column:
    """CASE WHEN chain from a literal mapping (F1).

    Mirrors the reference's root_type / account_type / shift recodes
    (dags/ssg_gl_etl.py:297-320, dags/hanger_lane.py:291,316-320) as a
    single ``when`` chain Catalyst can constant-fold and codegen.
    """
    expr: Column | None = None
    for key, value in mapping.items():
        # A None key must match NULL inputs: `col == lit(None)` is never
        # true under three-valued logic, so use an explicit null test.
        cond = col.isNull() if key is None else col == F.lit(key)
        expr = F.when(cond, F.lit(value)) if expr is None else expr.when(cond, F.lit(value))
    if expr is None:
        return F.lit(default)
    return expr.otherwise(F.lit(default))


def coalesce_zero(col: Column) -> Column:
    """COALESCE(x, 0) (F8) — the reference's fillna('0') / COALESCE(sum,0)."""
    return F.coalesce(col, F.lit(0))


def safe_ratio(num: Column, den: Column, scale: int = 4) -> Column:
    """round(coalesce(num,0) / nullif(coalesce(den,0),0), scale) (A9/F7-F8).

    Mirrors scripts/test/item_valuation_update.py:361-370: a ratio of two
    aggregate sums guarded against NULL and divide-by-zero.
    """
    return F.round(coalesce_zero(num) / F.nullif(coalesce_zero(den), F.lit(0)), scale)


def null_profile_exprs(columns: Iterable[str]) -> list[Column]:
    """One ``sum(col is null)`` per column (A15) — df.isnull().sum() in pandas."""
    return [
        F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls") for c in columns
    ]
