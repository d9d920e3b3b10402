"""Bottom-k (KMV) sketch (operators/sketches.bottomk_*): the stable
distinct-key sample + cardinality estimator. Pins both build regimes
(zero-shuffle over-fetch for near-unique keys; distinct-first fallback
for dup-heavy keys) against a brute-force reference, the min-union merge
law with its idempotence (the replay-safety algebra of the streaming
fold), and the estimator's exact-below-k contract."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from ssg_etl_spark.operators import sketches


def _md5(v) -> str:
    return hashlib.md5(str(v).encode()).hexdigest()


def _brute_bottomk(keys, k):
    seen = {}
    for key in keys:
        if key is None:
            continue
        seen.setdefault(_md5(key), key)
    return sorted(seen.items())[:k]


def _collect(sk):
    return sorted((r["h"], r[1]) for r in sk.collect())


def test_fast_path_near_unique_keys_matches_brute(spark):
    """Near-unique keys resolve in the first over-fetch round (no
    fallback) and match the brute-force bottom-k exactly; NULLs are
    ignored."""
    keys = list(range(3000)) + [7, 42, None, None]
    df = spark.createDataFrame(
        [(k,) for k in keys], "doc_id bigint"
    )
    got = _collect(sketches.bottomk_sketch(df, "doc_id", k=32))
    assert got == _brute_bottomk(keys, 32)


def test_fallback_dup_heavy_keys_matches_brute(spark):
    """150 keys x ~67 duplicates each defeats the over-fetch (the r10
    registry fixture shape); the distinct-first fallback still returns
    the exact bottom-k."""
    keys = [i % 150 for i in range(10_000)]
    df = spark.createDataFrame([(k,) for k in keys], "user_id bigint")
    got = _collect(sketches.bottomk_sketch(df, "user_id", k=64))
    assert got == _brute_bottomk(keys, 64)
    assert len(got) == 64


def test_merge_law_and_idempotence(spark):
    """Bottom-k of a union == bottom-k of the merged slice sketches, and
    re-merging an already-folded sketch changes nothing (the exactly-once
    algebra of the streaming fold)."""
    all_keys = list(range(500))
    slices = [all_keys[0:200], all_keys[200:350], all_keys[350:500]]
    dfs = [
        spark.createDataFrame([(k,) for k in s], "k bigint") for s in slices
    ]
    sks = [sketches.bottomk_sketch(d, "k", k=48) for d in dfs]
    merged = sketches.bottomk_merge(sks, k=48)
    whole = sketches.bottomk_sketch(
        spark.createDataFrame([(k,) for k in all_keys], "k bigint"), "k", k=48
    )
    assert _collect(merged) == _collect(whole)
    remerged = sketches.bottomk_merge([merged, sks[1]], k=48)
    assert _collect(remerged) == _collect(whole)


def test_estimate_exact_below_k_and_close_above(spark):
    """Fewer distinct keys than k -> the estimate IS the exact count;
    above k the KMV estimator lands within ~4/sqrt(k) of truth on a
    uniform fixture."""
    small = spark.createDataFrame([(i % 20,) for i in range(200)], "k bigint")
    row = sketches.kmv_distinct_estimate(
        sketches.bottomk_sketch(small, "k", k=64), k=64
    ).collect()[0]
    assert row["n_sample"] == 20 and row["approx_distinct"] == 20.0

    big = spark.createDataFrame([(i,) for i in range(5000)], "k bigint")
    row = sketches.kmv_distinct_estimate(
        sketches.bottomk_sketch(big, "k", k=256), k=256
    ).collect()[0]
    assert row["n_sample"] == 256
    assert abs(row["approx_distinct"] - 5000) / 5000 < 4 / (256 ** 0.5)


def test_streaming_bottomk_fold_matches_batch_and_replays_safely(
    spark, sf_dir, tmp_path
):
    """Micro-batch min-union fold == one-shot batch sketch; replaying a
    batch through the fold leaves the state identical (idempotence, not
    watermark bookkeeping)."""
    from ssg_etl_spark.schemas import EVENTS
    from ssg_etl_spark.sources.tables import load_table
    from ssg_etl_spark.sources.versioning import read_snapshot
    from ssg_etl_spark.streaming.pipeline import foreach_batch_bottomk_merge

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    events.repartition(3).write.parquet(src)

    sketch_path = str(tmp_path / "kmv")
    stream = (
        spark.readStream.schema(EVENTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            foreach_batch_bottomk_merge(sketch_path, "user_id", k=32)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = _collect(read_snapshot(spark, sketch_path))
    batch = _collect(sketches.bottomk_sketch(events, "user_id", k=32))
    assert streamed == batch

    foreach_batch_bottomk_merge(sketch_path, "user_id", k=32)(
        events.limit(500), batch_id=99
    )
    assert _collect(read_snapshot(spark, sketch_path)) == streamed


def _ests(spark, a_keys, b_keys, k):
    ska = sketches.bottomk_sketch(
        spark.createDataFrame([(x,) for x in a_keys], "k bigint"), "k", k=k
    )
    skb = sketches.bottomk_sketch(
        spark.createDataFrame([(x,) for x in b_keys], "k bigint"), "k", k=k
    )
    return sketches.kmv_set_estimates(ska, skb, k=k).collect()[0]


def test_set_estimates_exact_when_both_exhaustive(spark):
    """Both sketches below capacity -> union/intersection are exact counts
    and Jaccard is the exact ratio."""
    row = _ests(spark, list(range(30)), list(range(20, 50)), k=64)
    assert row["union_est"] == 50.0
    assert row["intersection_est"] == 10.0
    assert row["jaccard_est"] == 0.2
    assert row["n_window"] == 50


def test_set_estimates_disjoint_sets(spark):
    """Disjoint key spaces -> intersection and Jaccard estimate 0 in the
    sketch-estimation regime too."""
    row = _ests(spark, list(range(0, 3000)), list(range(10000, 13000)), k=128)
    assert row["intersection_est"] == 0.0 and row["jaccard_est"] == 0.0
    assert abs(row["union_est"] - 6000) / 6000 < 4 / (128 ** 0.5)


def test_set_estimates_overlap_accuracy(spark):
    """Half-overlapping 3000-key sets, k=256: union/intersection estimates
    land within the ~1/sqrt(k) KMV error envelope of truth."""
    a = list(range(0, 3000))
    b = list(range(1500, 4500))
    row = _ests(spark, a, b, k=256)
    assert abs(row["union_est"] - 4500) / 4500 < 4 / (256 ** 0.5)
    assert abs(row["intersection_est"] - 1500) / 1500 < 8 / (256 ** 0.5)
    assert abs(row["jaccard_est"] - 1500 / 4500) < 0.1


def test_grouped_sketch_matches_per_group_brute_and_merges(spark):
    """Grouped bottom-k == per-group brute force; per-group min-union
    merge is idempotent and equals the whole-data grouped sketch."""
    rows = [(("a" if i % 3 else "b"), i % 40) for i in range(400)]
    df = spark.createDataFrame(rows, "g string, k bigint")

    def per_group(sk):
        out = {}
        for r in sk.collect():
            out.setdefault(r["g"], []).append((r["h"], r["k"]))
        return {g: sorted(v) for g, v in out.items()}

    got = per_group(sketches.bottomk_sketch_grouped(df, "k", ["g"], k=8))
    want = {
        g: _brute_bottomk([k for gg, k in rows if gg == g], 8)
        for g in ("a", "b")
    }
    assert got == want

    halves = [
        sketches.bottomk_sketch_grouped(
            spark.createDataFrame(rows[i::2], "g string, k bigint"),
            "k",
            ["g"],
            k=8,
        )
        for i in range(2)
    ]
    merged = sketches.bottomk_merge_grouped(halves, ["g"], k=8)
    assert per_group(merged) == want
    remerged = sketches.bottomk_merge_grouped([merged, halves[0]], ["g"], k=8)
    assert per_group(remerged) == want


def test_grouped_set_estimates_match_binary_form_per_group(spark):
    """The plan-side grouped theta algebra (kmv_set_estimates_grouped)
    reproduces the binary driver-side form group by group — same theta,
    same window counts, same rounded estimates — across an exhaustive
    group, an estimation-regime group, and a disjoint group."""
    cases = {
        "ex": (list(range(30)), list(range(20, 50))),        # exhaustive
        "est": (list(range(0, 800)), list(range(400, 1200))),  # theta path
        "dis": (list(range(0, 500)), list(range(9000, 9500))),  # disjoint
    }
    k = 64
    rows_a = [(g, v) for g, (a, _) in cases.items() for v in a]
    rows_b = [(g, v) for g, (_, b) in cases.items() for v in b]
    dfa = spark.createDataFrame(rows_a, "g string, key bigint")
    dfb = spark.createDataFrame(rows_b, "g string, key bigint")
    got = {
        r["g"]: (
            r["n_window"],
            r["union_est"],
            r["intersection_est"],
            r["a_only_est"],
            r["b_only_est"],
            r["jaccard_est"],
        )
        for r in sketches.kmv_set_estimates_grouped(
            sketches.bottomk_sketch_grouped(dfa, "key", ["g"], k=k),
            sketches.bottomk_sketch_grouped(dfb, "key", ["g"], k=k),
            ["g"],
            k=k,
        ).collect()
    }
    for g, (a, b) in cases.items():
        row = sketches.kmv_set_estimates(
            sketches.bottomk_sketch(
                spark.createDataFrame([(v,) for v in a], "key bigint"),
                "key",
                k=k,
            ),
            sketches.bottomk_sketch(
                spark.createDataFrame([(v,) for v in b], "key bigint"),
                "key",
                k=k,
            ),
            k=k,
        ).collect()[0]
        assert got[g] == (
            row["n_window"],
            row["union_est"],
            row["intersection_est"],
            row["a_only_est"],
            row["b_only_est"],
            row["jaccard_est"],
        ), g


def test_grouped_set_estimates_merge_law(spark):
    """Overlap estimates from per-day grouped sketches FOLDED via
    bottomk_merge_grouped equal the estimates from whole-corpus grouped
    sketches — the property that lets daily sketch tables answer any
    date-range overlap question without rescanning."""
    k = 32
    rows_a = [("t%d" % (v % 2), v, v % 3) for v in range(600)]
    rows_b = [("t%d" % (v % 2), v + 200, v % 3) for v in range(600)]
    dfa = spark.createDataFrame(rows_a, "g string, key bigint, day int")
    dfb = spark.createDataFrame(rows_b, "g string, key bigint, day int")

    def folded(df):
        dailies = [
            sketches.bottomk_sketch_grouped(
                df.filter(F.col("day") == d), "key", ["g"], k=k
            )
            for d in range(3)
        ]
        return sketches.bottomk_merge_grouped(dailies, ["g"], k=k)

    def whole(df):
        return sketches.bottomk_sketch_grouped(df, "key", ["g"], k=k)

    def ests(sa, sb):
        return sorted(
            tuple(r)
            for r in sketches.kmv_set_estimates_grouped(
                sa, sb, ["g"], k=k
            ).collect()
        )

    assert ests(folded(dfa), folded(dfb)) == ests(whole(dfa), whole(dfb))


def test_overlap_matrix_matches_binary_form_per_pair(spark):
    """kmv_overlap_matrix == the binary driver-side form run on every
    source pair: same windows, same estimates — so the one-plan matrix
    is a pure cost optimization, not a semantic variant."""
    k = 32
    universes = {
        "s1": list(range(0, 300)),
        "s2": list(range(150, 450)),       # overlaps s1
        "s3": list(range(10_000, 10_020)),  # tiny, exhaustive side
    }
    rows = [(s, v) for s, vals in universes.items() for v in vals]
    df = spark.createDataFrame(rows, "src string, key bigint")
    sk = sketches.bottomk_sketch_grouped(df, "key", ["src"], k=k)
    got = {
        (r["src_a"], r["src_b"]): (
            r["n_window"],
            r["union_est"],
            r["intersection_est"],
            r["a_only_est"],
            r["b_only_est"],
            r["jaccard_est"],
        )
        for r in sketches.kmv_overlap_matrix(sk, "src", k=k).collect()
    }
    assert set(got) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    for a, b in got:
        row = sketches.kmv_set_estimates(
            sketches.bottomk_sketch(
                spark.createDataFrame(
                    [(v,) for v in universes[a]], "key bigint"
                ),
                "key",
                k=k,
            ),
            sketches.bottomk_sketch(
                spark.createDataFrame(
                    [(v,) for v in universes[b]], "key bigint"
                ),
                "key",
                k=k,
            ),
            k=k,
        ).collect()[0]
        assert got[(a, b)] == (
            row["n_window"],
            row["union_est"],
            row["intersection_est"],
            row["a_only_est"],
            row["b_only_est"],
            row["jaccard_est"],
        ), (a, b)


def test_overlap_matrix_from_folded_dailies(spark):
    """The matrix computed from per-day grouped sketches FOLDED via
    bottomk_merge_grouped equals the matrix from whole-corpus sketches:
    daily sketch tables answer any date-range overlap matrix."""
    k = 16
    rows = [
        ("s%d" % (v % 3), v * 7 % 500, v % 4) for v in range(900)
    ]
    df = spark.createDataFrame(rows, "src string, key bigint, day int")
    whole = sketches.bottomk_sketch_grouped(df, "key", ["src"], k=k)
    dailies = [
        sketches.bottomk_sketch_grouped(
            df.filter(F.col("day") == d), "key", ["src"], k=k
        )
        for d in range(4)
    ]
    folded = sketches.bottomk_merge_grouped(dailies, ["src"], k=k)

    def m(sk):
        return sorted(
            tuple(r) for r in sketches.kmv_overlap_matrix(sk, "src", k=k).collect()
        )

    assert m(folded) == m(whole)


def test_streaming_grouped_bottomk_fold_matches_batch_and_replays(
    spark, sf_dir, tmp_path
):
    """Per-group micro-batch min-union fold == one-shot grouped batch
    sketch; a replayed batch leaves state identical (idempotence); and
    the persisted table feeds the overlap matrix directly — the live
    maintenance side of the r11 overlap machinery."""
    from ssg_etl_spark.schemas import EVENTS
    from ssg_etl_spark.sources.tables import load_table
    from ssg_etl_spark.sources.versioning import read_snapshot
    from ssg_etl_spark.streaming.pipeline import (
        foreach_batch_bottomk_merge_grouped,
    )

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    events.repartition(3).write.parquet(src)

    sketch_path = str(tmp_path / "kmvg")
    stream = (
        spark.readStream.schema(EVENTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            foreach_batch_bottomk_merge_grouped(
                sketch_path, "user_id", ["event_type"], k=16
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    def per_group(sk):
        out = {}
        for r in sk.collect():
            out.setdefault(r["event_type"], []).append(
                (r["h"], r["user_id"])
            )
        return {g: sorted(v) for g, v in out.items()}

    streamed = per_group(read_snapshot(spark, sketch_path))
    batch = per_group(
        sketches.bottomk_sketch_grouped(
            events, "user_id", ["event_type"], k=16
        )
    )
    assert streamed == batch

    # Replay: identical state (idempotent algebra, no batch-id guard).
    foreach_batch_bottomk_merge_grouped(
        sketch_path, "user_id", ["event_type"], k=16
    )(events.limit(500), batch_id=99)
    assert per_group(read_snapshot(spark, sketch_path)) == streamed

    # The persisted table IS matrix input: pairs come out estimable.
    mat = sketches.kmv_overlap_matrix(
        read_snapshot(spark, sketch_path), "event_type", k=16
    ).collect()
    assert len(mat) == 10  # C(5,2) event-type pairs


def test_overlap_matrix_source_cardinality_guard(spark):
    """max_sources enforces the |S|^2 pair-expansion bound in code
    before any tagging work: 12 sources over a bound of 8 raises naming
    the measured count; raising the bound computes all C(12,2) pairs."""
    import pytest

    rows = [("s%02d" % (v % 12), v) for v in range(240)]
    df = spark.createDataFrame(rows, "src string, key bigint")
    sk = sketches.bottomk_sketch_grouped(df, "key", ["src"], k=8)
    with pytest.raises(ValueError, match="12 distinct sources.*max_sources=8"):
        sketches.kmv_overlap_matrix(sk, "src", k=8, max_sources=8)
    out = sketches.kmv_overlap_matrix(sk, "src", k=8, max_sources=12).collect()
    assert len(out) == 12 * 11 // 2


def test_set_estimates_difference_identity(spark):
    """union = intersection + a_only + b_only EXACTLY (same window, same
    scale factor — the identity holds in both regimes), and the
    difference estimates land near truth on the half-overlap fixture."""
    a = list(range(0, 3000))
    b = list(range(1500, 4500))
    row = _ests(spark, a, b, k=256)
    assert abs(
        row["union_est"]
        - (row["intersection_est"] + row["a_only_est"] + row["b_only_est"])
    ) < 1e-6
    assert abs(row["a_only_est"] - 1500) / 1500 < 8 / (256 ** 0.5)
    assert abs(row["b_only_est"] - 1500) / 1500 < 8 / (256 ** 0.5)

    # Exhaustive regime: exact counts.
    row = _ests(spark, list(range(30)), list(range(20, 50)), k=64)
    assert (row["a_only_est"], row["b_only_est"]) == (20.0, 20.0)

def test_grouped_set_estimates_keep_null_group_keys(spark):
    """bottomk_sketch_grouped emits NULL group keys (it only filters
    NULL member keys); the theta join-back is null-safe, so the NULL
    group gets estimates instead of silently vanishing (r11 advice)."""
    k = 16
    rows_a = [(None if v % 2 else "g1", v) for v in range(40)]
    rows_b = [(None if v % 2 else "g1", v) for v in range(20, 60)]
    dfa = spark.createDataFrame(rows_a, "g string, key bigint")
    dfb = spark.createDataFrame(rows_b, "g string, key bigint")
    got = {
        r["g"]: r["intersection_est"]
        for r in sketches.kmv_set_estimates_grouped(
            sketches.bottomk_sketch_grouped(dfa, "key", ["g"], k=k),
            sketches.bottomk_sketch_grouped(dfb, "key", ["g"], k=k),
            ["g"],
            k=k,
        ).collect()
    }
    assert set(got) == {"g1", None}
    # Each side holds 20 odd / 20 even keys; overlap [20,40) is 10 per
    # parity class. Both sides exceed k=16 so this is the theta regime;
    # just require a sane positive estimate for the NULL group.
    assert got[None] > 0


def test_overlap_matrix_ignores_null_sources(spark):
    """NULL sources are dropped at the API boundary: they cannot appear
    on a pair side and must not count toward max_sources (r11 advice —
    previously a NULL source silently vanished from pairs but still
    consumed a max_sources slot)."""
    rows = [("s%d" % (v % 3) if v % 4 else None, v) for v in range(120)]
    df = spark.createDataFrame(rows, "src string, key bigint")
    sk = sketches.bottomk_sketch_grouped(df, "key", ["src"], k=8)
    # 3 non-null sources; with max_sources=3 the NULL must not tip it.
    out = sketches.kmv_overlap_matrix(sk, "src", k=8, max_sources=3).collect()
    assert len(out) == 3
    assert all(r["src_a"] is not None and r["src_b"] is not None for r in out)

def test_grouped_fold_max_groups_raises_not_melts(spark, tmp_path):
    """A high-cardinality group column (per-URL instead of per-domain)
    must RAISE with the measured cardinality before any driver collect
    (r11 verdict #3 — the same raise-don't-melt discipline as
    max_sources / max_cluster_size), for both grouped streaming folds;
    under the bound, the fold commits normally."""
    import pytest

    from ssg_etl_spark.sources.versioning import read_snapshot
    from ssg_etl_spark.streaming.pipeline import (
        foreach_batch_bottomk_merge_grouped,
        foreach_batch_hll_merge,
    )

    rows = [("url_%04d" % v, v) for v in range(300)]
    batch = spark.createDataFrame(rows, "url string, key bigint")

    apply_kmv = foreach_batch_bottomk_merge_grouped(
        str(tmp_path / "kmv"), "key", ["url"], k=4, max_groups=100
    )
    with pytest.raises(ValueError, match="300 groups.*max_groups=100"):
        apply_kmv(batch, batch_id=0)

    apply_hll = foreach_batch_hll_merge(
        str(tmp_path / "hll"), ["url"], "key", max_groups=100
    )
    with pytest.raises(ValueError, match="300 groups.*max_groups=100"):
        apply_hll(batch, batch_id=0)

    # State accumulates ACROSS batches: two disjoint 80-group batches
    # pass a 100-group bound individually but trip it on the second
    # fold, because the bound is measured on the MERGED state.
    b1 = batch.filter("key < 80")
    b2 = batch.filter("key >= 80 and key < 160")
    apply_ok = foreach_batch_bottomk_merge_grouped(
        str(tmp_path / "kmv2"), "key", ["url"], k=4, max_groups=100
    )
    apply_ok(b1, batch_id=0)
    assert read_snapshot(spark, str(tmp_path / "kmv2")).count() == 80
    with pytest.raises(ValueError, match="160 groups"):
        apply_ok(b2, batch_id=1)

    with pytest.raises(ValueError, match="max_groups must be positive"):
        foreach_batch_bottomk_merge_grouped(
            str(tmp_path / "x"), "key", ["url"], max_groups=0
        )
