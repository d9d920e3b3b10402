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
