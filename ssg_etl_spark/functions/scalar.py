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


def utc_wall(ts: Column | str) -> Column:
    """UTC wall-clock view of a timestamp, independent of the ambient
    ``spark.sql.session.timeZone`` (F5/F6 hardening).

    Field extraction on a TIMESTAMP (``hour``, ``year``, ``CAST(.. AS
    DATE)``, ``date_format``) renders through the SESSION zone, so the same
    query returns shifted values inside an embedding application whose
    session is not UTC — the timezone twin of the round-6 ANSI trap.
    ``convert_timezone(NULL, 'UTC', ts)`` casts through the current session
    zone to TIMESTAMP_NTZ carrying the instant's UTC fields, which every
    downstream extraction then reads zone-independently. Business-time
    semantics across the engine are defined in UTC; wrap any extraction on
    a timestamp column in this helper. Plain comparisons, max/min, and
    interval arithmetic are instant-based and need no wrapping.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.convert_timezone(None, F.lit("UTC"), c)


def utc_ts_lit(value) -> Column:
    """A fixed absolute-instant TIMESTAMP literal from a wall-clock string
    or datetime, interpreted in UTC regardless of session timeZone or host
    zone. ``F.lit(s).cast("timestamp")`` parses through the SESSION zone,
    so the same cutoff names a different instant in every embedding
    application. An aware-UTC Python datetime converts to the exact instant
    at literal-build time and stays a foldable constant — comparisons
    against it still push down to the parquet scan (wrapping the COLUMN
    side instead would break pushdown).
    """
    import datetime as _dt

    if isinstance(value, str):
        value = _dt.datetime.fromisoformat(value)
    if isinstance(value, _dt.datetime):
        if value.tzinfo is None:
            value = value.replace(tzinfo=_dt.timezone.utc)
    elif isinstance(value, _dt.date):
        value = _dt.datetime(
            value.year, value.month, value.day, tzinfo=_dt.timezone.utc
        )
    return F.lit(value)


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
