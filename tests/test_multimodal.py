"""Multimodal plumbing: binary payloads, typed metadata, stubbed decode."""

from __future__ import annotations

import pytest

from ssg_etl_spark.operators import multimodal as MM
from ssg_etl_spark.sources.tables import load_table


def test_media_table_schema_and_features(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    assets = MM.media_from_documents(docs)
    assert dict(assets.dtypes)["payload"] == "binary"
    feats = MM.extract_features(assets, fake=True).collect()
    assert len(feats) == docs.count()
    for r in feats[:5]:
        assert len(r.feature) == MM.FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in r.feature)
        assert r.payload_bytes > 0


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        MM.decode_media(b"bytes", "image", fake=False)


def test_frame_sample_plan(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    assets = MM.media_from_documents(docs)
    plan = MM.frame_sample_plan(assets, every_ms=1000)
    n_video = assets.filter("media_type = 'video'").count()
    assert plan.select("asset_id").distinct().count() == n_video


def test_extract_features_null_payload_yields_null_row(spark):
    from pyspark.sql import functions as F

    from ssg_etl_spark.operators.multimodal import extract_features, frame_sample_plan

    assets = spark.createDataFrame(
        [(1, "image", b"abc"), (2, "audio", None)],
        "asset_id long, media_type string, payload binary",
    )
    rows = {r.asset_id: r for r in extract_features(assets, fake=True).collect()}
    assert rows[1].feature is not None and rows[1].payload_bytes == 3
    assert rows[2].feature is None and rows[2].payload_bytes is None

    # NULL duration keeps the asset in the sample plan (sample_ms NULL).
    vids = spark.createDataFrame(
        [(1, "video", 2000), (2, "video", None)],
        "asset_id long, media_type string, duration_ms long",
    )
    plan = frame_sample_plan(vids, every_ms=1000)
    got = {r.asset_id for r in plan.collect()}
    assert got == {1, 2}
    assert plan.filter(F.col("asset_id") == 2).first().sample_ms is None


def test_resize_images_stub_shapes(spark):
    import pytest as _pytest

    from ssg_etl_spark.operators.multimodal import resize_images

    assets = spark.createDataFrame(
        [(1, "image", b"abc"), (2, "video", b"zz"), (3, "image", None)],
        "asset_id long, media_type string, payload binary",
    )
    rows = {r.asset_id: r for r in resize_images(assets, 4, 2).collect()}
    # Only images are resized; payload is 3 bytes/pixel; deterministic.
    assert set(rows) == {1, 3}
    assert rows[1].payload_bytes == 4 * 2 * 3 == len(rows[1].payload)
    assert rows[3].payload is None and rows[3].payload_bytes is None
    again = {r.asset_id: r for r in resize_images(assets, 4, 2).collect()}
    assert again[1].payload == rows[1].payload

    with _pytest.raises(ValueError):
        resize_images(assets, 0, 2)
    with _pytest.raises(NotImplementedError):
        resize_images(assets, 4, 2, fake=False)
