"""The quantile-family dispatcher (operators/analytics.quantiles):
routing checks for every cell of the (mergeable, error_contract,
scan_budget) matrix, the documented raises for impossible demands, and
one executed smoke per routed member proving the dispatcher actually
runs what the route names."""

from __future__ import annotations

import pytest

from ssg_etl_spark.operators import analytics


def test_routing_matrix():
    r = analytics.quantiles_route
    # Mergeable demands a sketch: always logbucket, grouped or not.
    assert r(mergeable=True) == "logbucket"
    assert r(mergeable=True, error_contract="range_scaled") == "logbucket"
    assert r(mergeable=True, grouped=True) == "logbucket"
    # Exact routes to the zoom, grouped to its grouped twin.
    assert r(error_contract="exact") == "quantiles_exact"
    assert r(error_contract="exact", grouped=True) == "quantiles_exact_grouped"
    assert r(error_contract="exact", scan_budget=8) == "quantiles_exact"
    # Relative (the default) is the logbucket sketch.
    assert r() == "logbucket"
    assert r(grouped=True) == "logbucket"
    # Range-scaled: refined two-pass when scans allow, one-pass at 1.
    assert r(error_contract="range_scaled") == "histogram_quantiles_refined"
    assert (
        r(error_contract="range_scaled", grouped=True)
        == "histogram_quantiles_grouped_refined"
    )
    assert (
        r(error_contract="range_scaled", scan_budget=1)
        == "histogram_quantiles"
    )
    assert (
        r(error_contract="range_scaled", scan_budget=1, grouped=True)
        == "histogram_quantiles_grouped"
    )


def test_impossible_demands_raise():
    with pytest.raises(ValueError, match="no mergeable exact"):
        analytics.quantiles_route(mergeable=True, error_contract="exact")
    with pytest.raises(ValueError, match="multi-scan"):
        analytics.quantiles_route(error_contract="exact", scan_budget=1)
    with pytest.raises(ValueError, match="error_contract"):
        analytics.quantiles_route(error_contract="absolute")


def test_dispatcher_executes_each_route(spark):
    vals = [float(i) for i in range(1, 201)]
    df = spark.createDataFrame(
        [(v, "a" if i % 2 else "b") for i, v in enumerate(vals)],
        "x double, g string",
    )
    # Exact: the true order statistic.
    exact = {
        r["q"]: r["value"]
        for r in analytics.quantiles(
            df, "x", (0.5,), error_contract="exact"
        ).collect()
    }
    assert exact[0.5] == 100.0
    # Relative default: logbucket schema (value_est), within 0.5%.
    rel = analytics.quantiles(df, "x", (0.5,)).collect()
    assert {r["q"]: True for r in rel} == {0.5: True}
    assert abs(rel[0].value_est - 100.0) / 100.0 <= 0.005
    # Grouped relative keeps the group column.
    grel = analytics.quantiles(df, "x", (0.5,), group_cols=["g"]).collect()
    assert {r["g"] for r in grel} == {"a", "b"}
    # Range-scaled single-scan: one-pass histogram (has a bin column).
    hist = analytics.quantiles(
        df, "x", (0.5,), error_contract="range_scaled", scan_budget=1
    )
    assert "bin" in hist.columns
    # Range-scaled unconstrained: refined (sub_bin column).
    ref = analytics.quantiles(
        df, "x", (0.5,), error_contract="range_scaled"
    )
    assert "sub_bin" in ref.columns
    # Mergeable grouped: sketch-backed estimate per group.
    mg = analytics.quantiles(
        df, "x", (0.5,), group_cols=["g"], mergeable=True
    ).collect()
    assert len(mg) == 2 and all("value_est" in r.asDict() for r in mg)
