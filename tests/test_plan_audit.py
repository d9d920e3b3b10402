"""Physical-plan regression guard: the headline queries must stay free of
single-partition windows and row-at-a-time Python UDFs (tools/plan_audit
as a pytest gate, so a regression fails the suite, not just the manual
audit)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from plan_audit import AUDIT_DEFAULT, audit_one, formatted_plan  # noqa: E402

from ssg_etl_spark.plans.registry import load_all


def test_headline_plans_have_no_scale_flags(spark, sf_dir):
    specs = load_all(include_extra=True)
    flagged = {}
    for name in AUDIT_DEFAULT:
        df = specs[name].builder(spark, sf_dir)
        notes = [n for n in audit_one(name, df, formatted_plan(df)) if "<-- FIX" in n]
        if notes:
            flagged[name] = notes
    assert not flagged, flagged


def test_dynamic_partition_pruning_fires(spark, sf_dir):
    """The date-partitioned rollup must scan with a runtime
    dynamicpruningexpression PartitionFilter — proof the dim filter
    prunes fact partitions at the source, not post-scan (SURVEY §4)."""
    import re

    specs = load_all(include_extra=True)
    df = specs["dpp_partitioned_rollup"].builder(spark, sf_dir)
    plan = formatted_plan(df)
    part_filters = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert any("dynamicpruning" in p for p in part_filters), plan


def test_detector_catches_single_partition_window(spark, sf_dir):
    """The JVM-tree detector must actually fire on a bare ordered window —
    the text form is ungreppable (formatted explain drops empty arg lists),
    which made a regex detector silently vacuous."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from plan_audit import single_partition_windows

    from ssg_etl_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    bad = orders.select(
        F.row_number().over(Window.orderBy("o_orderkey")).alias("rn")
    )
    assert single_partition_windows(bad) >= 1
    good = orders.select(
        F.row_number()
        .over(Window.partitionBy("o_orderdate").orderBy("o_orderkey"))
        .alias("rn")
    )
    assert single_partition_windows(good) == 0
