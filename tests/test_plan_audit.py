"""Physical-plan regression guard: the headline queries must stay free of
single-partition windows and row-at-a-time Python UDFs (tools/plan_audit
as a pytest gate, so a regression fails the suite, not just the manual
audit)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from plan_audit import (  # noqa: E402
    AUDIT_DEFAULT,
    FINGERPRINT_PATH,
    audit_one,
    compute_fingerprints,
    formatted_plan,
)

from ssg_etl_spark.plans.registry import load_all


@pytest.fixture(autouse=True)
def _cold_plans(spark):
    """Plan assertions are about the COLD plan: persisted frames left by
    other test modules make CacheManager swap InMemoryTableScan into
    matching sub-plans, churning fingerprints and hiding scan pruning."""
    from ssg_etl_spark.cache import release_tracked

    release_tracked()
    spark.catalog.clearCache()
    yield


def test_headline_plans_have_no_scale_flags(spark, sf_dir):
    specs = load_all(include_extra=True)
    flagged = {}
    for name in AUDIT_DEFAULT:
        df = specs[name].builder(spark, sf_dir)
        notes = [n for n in audit_one(name, df, formatted_plan(df)) if "<-- FIX" in n]
        if notes:
            flagged[name] = notes
    assert not flagged, flagged


def test_plan_fingerprints_unchanged(spark, sf_dir):
    """Plan-regression gate (r4 verdict item 8): the audited queries'
    structural fingerprints (join strategies, exchanges, pandas stages,
    scan pruning) must match the committed tools/plan_fingerprints.json.
    A deliberate plan change regenerates the file in the same commit:

        python tools/plan_audit.py --update-fingerprints

    An UNintentional mismatch is the silent kind of regression that cost
    gl_enrichment +31% wall in r4 with zero audit flags."""
    import json

    with open(FINGERPRINT_PATH) as f:
        committed = json.load(f)
    # conftest's session (sf0.001, local[4], 8 shuffle partitions) is the
    # environment the file is pinned at — see plan_audit.FINGERPRINT_*.
    current = compute_fingerprints(spark, sf_dir, AUDIT_DEFAULT)
    drift = {
        name: {
            k: (committed.get(name, {}).get(k), v)
            for k, v in fp.items()
            if committed.get(name, {}).get(k) != v
        }
        for name, fp in current.items()
        if committed.get(name) != fp
    }
    assert not drift, (
        "plan fingerprints drifted (committed vs current) — if intentional, "
        f"run: python tools/plan_audit.py --update-fingerprints\n{drift}"
    )


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
