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
        plan = formatted_plan(specs[name].builder(spark, sf_dir))
        notes = [n for n in audit_one(name, plan) if "<-- FIX" in n]
        if notes:
            flagged[name] = notes
    assert not flagged, flagged
