"""Mergeable Bloom membership index (operators/bloom.py): no false
negatives, exact merge law, NULL-key rule, and the sizing error path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ssg_etl_spark.operators.bloom import bloom_build, bloom_merge, bloom_probe


def _words(df):
    return {(r["word"], r["bits"]) for r in df.collect()}


def test_no_false_negatives_and_fp_rate_bounded(spark):
    keys = spark.createDataFrame([(i,) for i in range(200)], ["k"])
    flt = bloom_build(keys, "k", n_bits=2048, k=4)
    # Probe the built keys plus 800 unseen ones.
    probe = spark.createDataFrame([(i,) for i in range(1000)], ["k"])
    got = {r["k"]: r["maybe_present"] for r in bloom_probe(flt, probe, "k", n_bits=2048, k=4).collect()}
    assert all(got[i] for i in range(200)), "false negative — impossible by algebra"
    fps = sum(1 for i in range(200, 1000) if got[i])
    # n=200, m=2048, k=4 → fp ≈ (1-e^{-800/2048})^4 ≈ 1.0%; allow slack.
    assert fps <= 40, fps


def test_merge_equals_build_of_union(spark):
    a = spark.createDataFrame([(i,) for i in range(0, 150)], ["k"])
    b = spark.createDataFrame([(i,) for i in range(100, 250)], ["k"])
    merged = bloom_merge(
        [bloom_build(a, "k", n_bits=512, k=3), bloom_build(b, "k", n_bits=512, k=3)]
    )
    whole = bloom_build(a.unionByName(b), "k", n_bits=512, k=3)
    assert _words(merged) == _words(whole)


def test_null_keys_ignored(spark):
    clean = spark.createDataFrame([(str(i),) for i in range(50)], ["k"])
    dirty = clean.unionByName(
        spark.createDataFrame([(None,)] * 5, "k string")
    )
    assert _words(bloom_build(clean, "k")) == _words(bloom_build(dirty, "k"))


def test_grouped_filters_are_independent(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(50)] + [("b", i) for i in range(50, 100)],
        ["g", "k"],
    )
    flt = bloom_build(df, "k", group_cols=["g"], n_bits=512, k=3)
    probe = spark.createDataFrame(
        [("a", 10), ("b", 10), ("b", 60), ("a", 60)], ["g", "k"]
    )
    got = {
        (r["g"], r["k"]): r["maybe_present"]
        for r in bloom_probe(flt, probe, "k", group_cols=["g"], n_bits=512, k=3).collect()
    }
    assert got[("a", 10)] and got[("b", 60)]
    # Cross-group probes are not members (fp possible but wildly unlikely
    # at 100 keys / 512 bits for these two fixed values).
    assert not got[("b", 10)] and not got[("a", 60)]


def test_sizing_errors(spark):
    keys = spark.createDataFrame([(1,)], ["k"])
    with pytest.raises(ValueError):
        bloom_build(keys, "k", n_bits=1000)
    with pytest.raises(ValueError):
        bloom_build(keys, "k", k=0)


def test_streaming_bloom_fold_matches_batch_and_replays(spark, sf_dir, tmp_path):
    """Micro-batch OR-folded filter == one-shot batch filter of the full
    table; replaying a slice is a no-op (OR idempotence); prior snapshot
    versions survive (atomic state commits)."""
    from ssg_etl_spark.schemas import EVENTS
    from ssg_etl_spark.sources.tables import load_table
    from ssg_etl_spark.sources.versioning import read_snapshot, snapshot_versions
    from ssg_etl_spark.streaming.pipeline import foreach_batch_bloom_merge

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    events.repartition(3).write.parquet(src)

    bloom_path = str(tmp_path / "bloom")
    stream = (
        spark.readStream.schema(EVENTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            foreach_batch_bloom_merge(bloom_path, "user_id")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = _words(read_snapshot(spark, bloom_path))
    batch = _words(bloom_build(events, "user_id"))
    assert streamed == batch

    foreach_batch_bloom_merge(bloom_path, "user_id")(
        events.limit(300), batch_id=999
    )
    assert _words(read_snapshot(spark, bloom_path)) == streamed
    versions = snapshot_versions(bloom_path)
    assert len(versions) >= 2
    assert _words(read_snapshot(spark, bloom_path, versions[-2])) == streamed


def test_partition_invariance(spark):
    keys = spark.createDataFrame([(i,) for i in range(300)], ["k"])
    one = _words(bloom_build(keys.coalesce(1), "k", n_bits=1024, k=4))
    many = _words(bloom_build(keys.repartition(13), "k", n_bits=1024, k=4))
    assert one == many
