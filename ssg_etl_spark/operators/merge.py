"""Merge / upsert / change-detection / SCD2 (SURVEY §2.9 M5-M14).

The reference's signature operations: staging-table ON CONFLICT upsert
(dags/upsert_utils.py:27-99), destination change comparison (Incremental
Load notebook: exceptAll + semi/anti split), source change detection
(created/modified watermark), and dlt's SCD2 strategy
(dltproject/sql_product_scd.py:11-33).

Spark has no in-place UPDATE; every merge is a join-rewrite: read target,
join with staging, coalesce, rewrite. At scale this is a partition-scoped
rewrite (only partitions containing touched keys), which is exactly what
Delta/Iceberg MERGE INTO compiles to — here implemented directly on
DataFrames so it runs on plain parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """M5/M10: full-outer join-rewrite merge — source wins on key collision.

    Equivalent of ``INSERT ... ON CONFLICT (keys) DO UPDATE SET col =
    EXCLUDED.col`` (upsert_utils.py:76-84). One shuffle on the key; with a
    bucketed/partitioned target the join co-locates and only touched
    partitions rewrite.

    Precondition (as in the Postgres analog, which errors on it): ``source``
    carries at most ONE row per key — duplicate source keys would fan the
    join out to duplicate-key output. Reduce first (``dropDuplicates`` or a
    sequenced winner, as apply_cdc_batch / foreach_batch_upsert do).
    Output keeps the target's column order — a drop-in target rewrite.
    """
    value_cols = [c for c in target.columns if c not in keys]
    t = target.alias("t")
    s = source.withColumn("_src_present", F.lit(True)).alias("s")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys]
    joined = t.join(s, cond, "full_outer")
    # Key columns may legitimately be NULL (eqNullSafe join), so source-row
    # presence is tracked with an explicit marker, not key non-nullness.
    src_exists = F.coalesce(F.col("s._src_present"), F.lit(False))
    # Row-level winner: if the source row exists, all its values win
    # (EXCLUDED.*); else keep target. Decided per-row, not per-column, so a
    # legitimate NULL in the source still overwrites.
    out = {
        c: F.when(src_exists, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
        for c in keys + value_cols
    }
    return joined.select(*[out[c] for c in target.columns])


def detect_changes(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """M7: destination change comparison.

    ``changes = source EXCEPT ALL target`` (full-row diff), then split into
    updates (key exists in target) and inserts (no such key), returned as
    one DataFrame tagged ``change_type``. Mirrors the notebook's three
    cells (J7/J8/J9) in a single shuffle-shared plan; the key membership
    test is null-safe (same key semantics as :func:`merge_upsert`), and the
    update/insert split is ONE left join classified by a presence marker,
    not two joins.
    """
    if set(source.columns) != set(target.columns):
        raise ValueError(
            f"column sets differ: source={sorted(source.columns)} "
            f"target={sorted(target.columns)}"
        )
    # exceptAll compares positionally — align source to the target's order
    # so same-named-different-order inputs diff the right columns.
    source = source.select(*target.columns)
    changes = source.exceptAll(target).alias("c")
    target_keys = (
        target.select(*keys)
        .distinct()
        .withColumn("_t_present", F.lit(True))
        .alias("tk")
    )
    cond = [F.col(f"c.{k}").eqNullSafe(F.col(f"tk.{k}")) for k in keys]
    return (
        changes.join(target_keys, cond, "left")
        .select(
            *[F.col(f"c.{c}") for c in target.columns],
            F.when(F.coalesce(F.col("_t_present"), F.lit(False)), F.lit("update"))
            .otherwise(F.lit("insert"))
            .alias("change_type"),
        )
    )


def source_changed_rows(
    df: DataFrame, created_col: str, modified_col: str, watermark
) -> DataFrame:
    """M8: source change detection — created OR modified since watermark
    (Source-Change-Detection notebook: ``created_at >= wm OR modified_at >= wm``).

    The watermark enters as an NTZ literal (``utc_ts_lit``) so the
    comparison against NTZ columns never coerces through the ambient
    session zone (round-8 tz contract)."""
    from ssg_etl_spark.functions.scalar import utc_ts_lit

    wm = utc_ts_lit(watermark)
    return df.filter((F.col(created_col) >= wm) | (F.col(modified_col) >= wm))


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    keys: list[str],
    attrs: list[str],
    effective_date: str,
) -> DataFrame:
    """M11: SCD Type-2 expire-and-insert.

    ``current`` carries (keys, attrs, valid_from, valid_to, is_current).
    For every update whose attributes differ from the current version:
    expire the old row (valid_to = effective_date, is_current = false) and
    append a new version (valid_from = effective_date). Updates identical to
    the current version are no-ops; updates for brand-new (or retired) keys
    insert a fresh current version. Equivalent to dlt's
    ``write_disposition={'strategy': 'scd2'}`` (sql_product_scd.py:11-33).

    ``updates`` is reduced to one row per key first (a dimension batch
    should carry at most one version per key; when it carries several, an
    arbitrary one is kept — pre-aggregate upstream if order matters). Keys
    are assumed non-null (dimension natural keys).
    """
    eff = F.lit(effective_date).cast("date")
    updates = updates.dropDuplicates(keys)

    cur = current.alias("c")
    upd = updates.alias("u")
    join_cond = [F.col(f"c.{k}") == F.col(f"u.{k}") for k in keys]

    attr_differs = F.lit(False)
    for a in attrs:
        attr_differs = attr_differs | ~F.col(f"c.{a}").eqNullSafe(F.col(f"u.{a}"))

    # Updates that actually change the current version of their key.
    changed = (
        cur.filter(F.col("c.is_current"))
        .join(upd, join_cond)
        .filter(attr_differs)
        .select(*[F.col(f"u.{k}").alias(k) for k in keys], *[F.col(f"u.{a}").alias(a) for a in attrs])
    )
    changed_keys = changed.select(*keys).distinct()

    # 1) current rows whose key changed → expired.
    expired = (
        current.filter(F.col("is_current"))
        .join(changed_keys, keys, "left_semi")
        .withColumn("valid_to", eff)
        .withColumn("is_current", F.lit(False))
    )
    # 2) current rows untouched (plus all already-historical rows).
    untouched_current = current.filter(F.col("is_current")).join(
        changed_keys, keys, "left_anti"
    )
    history = current.filter(~F.col("is_current"))
    # 3) new versions of changed keys.
    new_versions = (
        changed.withColumn("valid_from", eff)
        .withColumn("valid_to", F.lit(None).cast("date"))
        .withColumn("is_current", F.lit(True))
    )
    # 4) inserts: keys with no live current version (brand-new or retired).
    live_keys = current.filter(F.col("is_current")).select(*keys).distinct()
    inserts = (
        updates.join(live_keys, keys, "left_anti")
        .select(*keys, *attrs)
        .withColumn("valid_from", eff)
        .withColumn("valid_to", F.lit(None).cast("date"))
        .withColumn("is_current", F.lit(True))
    )
    cols = current.columns
    return (
        history.select(cols)
        .unionByName(untouched_current.select(cols))
        .unionByName(expired.select(cols))
        .unionByName(new_versions.select(cols))
        .unionByName(inserts.select(cols))
    )
