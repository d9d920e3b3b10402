"""Z-order (Morton) clustering key + range-clustered export."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from ssg_etl_spark.operators.zorder import zorder_export, zorder_key


def test_zorder_known_interleave_values(spark):
    """With both columns spanning exactly [0, 255], cell == value, so the
    key equals the hand-computed bit interleave (x at even positions, y
    at odd)."""
    pts = [(0, 0), (3, 5), (255, 255), (1, 0), (0, 1), (128, 128)]
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(pts)]
        + [(99, 0.0, 255.0), (98, 255.0, 0.0)],  # pin both mins/maxes
        "id long, x double, y double",
    )
    got = {
        r.id: r.zorder
        for r in zorder_key(df, ["x", "y"], bits=8).collect()
    }

    def morton(x: int, y: int) -> int:
        z = 0
        for b in range(8):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    for i, (x, y) in enumerate(pts):
        assert got[i] == morton(x, y), (i, x, y)
    assert got[0] == 0
    assert got[1] == 0b100111  # x=3 (11), y=5 (101) -> 39


def test_zorder_quadrant_locality(spark):
    """Every point in the low quadrant (both dims < midpoint) keys below
    every point in the high quadrant (both dims >= midpoint) — the
    data-skipping property: a two-sided range predicate prunes whole
    z-ranges."""
    rows = [
        (i, float((i * 37) % 256), float((i * 91) % 256)) for i in range(400)
    ] + [(900, 0.0, 0.0), (901, 255.0, 255.0)]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    keyed = zorder_key(df, ["x", "y"], bits=8).collect()
    low = [r.zorder for r in keyed if r.x < 128 and r.y < 128]
    high = [r.zorder for r in keyed if r.x >= 128 and r.y >= 128]
    assert low and high
    assert max(low) < min(high)


def test_zorder_null_and_constant_columns(spark):
    """NULLs and a constant (degenerate-span) column quantize to cell 0
    instead of NaN-poisoning the key."""
    df = spark.createDataFrame(
        [(0, None, 7.0), (1, 4.0, 7.0), (2, 9.0, 7.0)],
        "id long, x double, y double",
    )
    got = {r.id: r.zorder for r in zorder_key(df, ["x", "y"], bits=4).collect()}
    assert all(v is not None for v in got.values())
    assert got[0] == 0  # NULL x, constant y -> both cells 0
    assert got[1] == 0  # x at its own min -> cell 0
    assert got[2] == 85  # x cell 15 interleaved at even positions (bits=4)


def test_zorder_export_files_have_disjoint_ranges(spark):
    """Export writes multiple files whose z-ranges do not overlap
    (repartitionByRange contract) — per-file min-max stats stay tight on
    both participating dimensions."""
    rows = [
        (i, float((i * 37) % 256), float((i * 91) % 256)) for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "id long, x double, y double")
    path = os.path.join(tempfile.gettempdir(), "ssg_etl_zorder_test")
    try:
        zorder_export(df, ["x", "y"], path, num_files=8, bits=8)
        back = spark.read.parquet(path).withColumn(
            "_f", F.input_file_name()
        )
        ranges = (
            back.groupBy("_f")
            .agg(F.min("zorder").alias("mn"), F.max("zorder").alias("mx"))
            .collect()
        )
        assert len(ranges) > 1
        spans = sorted((r.mn, r.mx) for r in ranges)
        for (_, prev_mx), (nxt_mn, _) in zip(spans, spans[1:]):
            assert prev_mx <= nxt_mn
        assert back.count() == 2000
    finally:
        shutil.rmtree(path, ignore_errors=True)
