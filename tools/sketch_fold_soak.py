"""Sustained-rate soak for the r11 streaming sketch folds (r11 verdict
#6): the grouped bottom-k (KMV) fold and the WEIGHTED log-bucket fold
have stream==batch pytest pins but had no long-soak evidence. This
drives each through ≥60 REAL file-source micro-batches (one file per
trigger) with inline retention ON, then asserts the operational
envelope the pins can't see:

  * per-batch wall is FLAT: median of the last 10 batches within 2.5×
    the median of the first 10 (state is re-read and re-written every
    batch — creep here would mean the fold re-reads history);
  * on-disk state is BOUNDED by the retention window, not batch count
    (each commit is one coalesced file + one manifest; keep_versions
    vacuums the rest inline);
  * mid-history REPLAY is idempotent: re-applying an already-folded
    batch leaves the persisted state byte-identical — by min-union
    algebra for the KMV fold, by the manifest batch-id watermark for
    the SUM-merge weighted log-bucket fold;
  * the final state equals the ONE-SHOT batch computation over all
    rows (stream == batch at soak length, not just at pin length).

r13 additions (r12 verdict #6/#7):
  * the streaming IVF index fold (foreach_batch_ivf_append) gets the
    same ≥60-batch soak: flat wall, bounded snapshots, mid-soak replay
    skipped by the watermark, final PROBE results equal to a one-shot
    batch assignment of the whole corpus;
  * the weighted log-bucket fold is INSTRUMENTED per batch (occupied
    bucket count, on-disk files, snapshot versions) and followed by a
    fresh-state 10-batch KMV re-check, separating the three slope
    candidates the r12 soak could not: state-cardinality growth
    (per-batch bucket counts), snapshot/manifest growth (per-batch file
    counts under inline retention), and SESSION AGING (the re-check
    replays the first-10 shape of the morning's KMV fold on the aged
    JVM — if it reads high, the slope is the session, not the fold).

Usage: python tools/sketch_fold_soak.py [n_batches]   (default 60)
Writes tools/sketch_fold_soak_r13.json.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf0.01"
KEEP_VERSIONS = 5
KMV_K = 64
IVF_COMPACT_EVERY = 16
QS = (0.25, 0.5, 0.9, 0.99)


def count_files(path: str) -> dict:
    data, manifests = 0, 0
    for _root, _dirs, names in os.walk(path):
        for n in names:
            if n.endswith(".parquet"):
                data += 1
            elif n.endswith(".json"):
                manifests += 1
    return {"data_files": data, "manifests": manifests}


def run_fold_stream(
    spark, schema, src: str, ckpt: str, apply_fn, post_fn=None
) -> list[dict]:
    """Drive apply_fn through a real AvailableNow file-source stream,
    timing each micro-batch. ``post_fn(batch_id)`` (optional) runs after
    the timed region — instrumentation reads never inflate the walls."""
    timings: list[dict] = []

    def timed(batch, batch_id):
        t0 = time.monotonic()
        apply_fn(batch, batch_id)
        timings.append(
            {"batch_id": int(batch_id), "wall_s": round(time.monotonic() - t0, 3)}
        )
        if post_fn is not None:
            post_fn(int(batch_id))

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(timed)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return timings


def snapshot_signature(spark, path: str) -> tuple:
    """Order-insensitive content signature of the latest snapshot."""
    from ssg_etl_spark.sources.versioning import read_snapshot

    df = read_snapshot(spark, path)
    return tuple(sorted(tuple(r) for r in df.collect()))


def main() -> int:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    from pyspark.sql import functions as F

    from ssg_etl_spark.operators import sketches
    from ssg_etl_spark.schemas import DOCUMENTS, EVENTS
    from ssg_etl_spark.session import get_spark
    from ssg_etl_spark.streaming.pipeline import (
        foreach_batch_bottomk_merge_grouped,
        foreach_batch_logbucket_merge,
    )

    spark = get_spark("sketch_fold_soak")
    tmp = tempfile.mkdtemp(prefix="fold_soak_")
    results: dict = {"n_batches": n_batches, "folds": {}}
    ok = True
    try:
        # ---------------- grouped bottom-k (KMV) fold over events
        events = spark.read.parquet(f"{SF_DIR}/events.parquet")
        src_e = os.path.join(tmp, "src_events")
        for i in range(n_batches):
            events.filter(
                F.pmod(F.col("event_id"), n_batches) == i
            ).coalesce(1).write.mode("append").parquet(src_e)

        kmv_path = os.path.join(tmp, "kmv_state")
        kmv_apply = foreach_batch_bottomk_merge_grouped(
            kmv_path,
            "user_id",
            ["event_type"],
            k=KMV_K,
            keep_versions=KEEP_VERSIONS,
        )
        kmv_timings = run_fold_stream(
            spark, EVENTS, src_e, os.path.join(tmp, "ckpt_kmv"), kmv_apply
        )

        # Mid-history replay: re-apply slice 7 with its original batch id.
        before = snapshot_signature(spark, kmv_path)
        kmv_apply(
            events.filter(F.pmod(F.col("event_id"), n_batches) == 7),
            batch_id=7,
        )
        kmv_replay_ok = snapshot_signature(spark, kmv_path) == before

        # Stream == one-shot batch at soak length.
        batch_sig = tuple(
            sorted(
                tuple(r)
                for r in sketches.bottomk_sketch_grouped(
                    events, "user_id", ["event_type"], k=KMV_K
                ).collect()
            )
        )
        kmv_match = before == batch_sig

        walls = [t["wall_s"] for t in kmv_timings]
        kmv_first10, kmv_last10 = (
            statistics.median(walls[:10]),
            statistics.median(walls[-10:]),
        )
        kmv_files = count_files(kmv_path)
        results["folds"]["bottomk_grouped"] = {
            "batches": len(kmv_timings),
            "wall_median_first10_s": round(kmv_first10, 3),
            "wall_median_last10_s": round(kmv_last10, 3),
            "wall_flatness": round(kmv_last10 / kmv_first10, 2),
            "replay_idempotent": kmv_replay_ok,
            "stream_equals_batch": kmv_match,
            "final_on_disk": kmv_files,
            "keep_versions": KEEP_VERSIONS,
            "per_batch": kmv_timings,
        }
        # Retention bound: one data file + one manifest per kept version
        # (plus the manifest pointer); generous factor-of-2 headroom.
        kmv_bounded = (
            kmv_files["data_files"] <= 2 * KEEP_VERSIONS
            and kmv_files["manifests"] <= 2 * KEEP_VERSIONS + 1
        )
        ok = ok and kmv_replay_ok and kmv_match and kmv_bounded
        ok = ok and kmv_last10 <= 2.5 * kmv_first10

        # ---------------- WEIGHTED log-bucket fold over documents
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        src_d = os.path.join(tmp, "src_docs")
        for i in range(n_batches):
            docs.filter(F.pmod(F.col("doc_id"), n_batches) == i).coalesce(
                1
            ).write.mode("append").parquet(src_d)

        lb_path = os.path.join(tmp, "lb_state")
        lb_apply = foreach_batch_logbucket_merge(
            lb_path,
            "n_chars",
            keep_versions=KEEP_VERSIONS,
            weight_col="n_chars",
        )

        # Instrumentation (r13): after each micro-batch, record the state
        # cardinality (occupied buckets) and on-disk footprint. These
        # reads run OUTSIDE the timed wall, so the recorded walls stay
        # comparable with r12's.
        from ssg_etl_spark.sources.versioning import (
            read_snapshot as _read_snap,
        )
        from ssg_etl_spark.sources.versioning import (
            snapshot_versions as _snap_versions,
        )

        lb_state_track: list[dict] = []

        def lb_post(batch_id: int) -> None:
            files = count_files(lb_path)
            lb_state_track.append(
                {
                    "batch_id": batch_id,
                    "state_rows": _read_snap(spark, lb_path).count(),
                    "versions": len(_snap_versions(lb_path)),
                    **files,
                }
            )

        lb_timings = run_fold_stream(
            spark, DOCUMENTS, src_d, os.path.join(tmp, "ckpt_lb"),
            lb_apply, post_fn=lb_post,
        )

        # Replay the LAST batch id: the SUM fold must skip it via the
        # manifest watermark (re-adding would double-count).
        before = snapshot_signature(spark, lb_path)
        last_id = lb_timings[-1]["batch_id"]
        lb_apply(
            docs.filter(F.pmod(F.col("doc_id"), n_batches) == last_id),
            batch_id=last_id,
        )
        lb_replay_ok = snapshot_signature(spark, lb_path) == before

        # Stream == one-shot batch: identical bucket tables AND identical
        # weighted quantile reads.
        batch_sig = tuple(
            sorted(
                tuple(r)
                for r in sketches.logbucket_sketch(
                    docs, "n_chars", weight_col="n_chars"
                ).collect()
            )
        )
        lb_match = before == batch_sig
        from ssg_etl_spark.sources.versioning import read_snapshot

        stream_q = sorted(
            tuple(r)
            for r in sketches.logbucket_quantiles(
                read_snapshot(spark, lb_path), QS
            ).collect()
        )
        batch_q = sorted(
            tuple(r)
            for r in sketches.logbucket_quantiles(
                sketches.logbucket_sketch(
                    docs, "n_chars", weight_col="n_chars"
                ),
                QS,
            ).collect()
        )
        lb_q_match = stream_q == batch_q

        walls = [t["wall_s"] for t in lb_timings]
        lb_first10, lb_last10 = (
            statistics.median(walls[:10]),
            statistics.median(walls[-10:]),
        )
        lb_files = count_files(lb_path)
        results["folds"]["logbucket_weighted"] = {
            "batches": len(lb_timings),
            "wall_median_first10_s": round(lb_first10, 3),
            "wall_median_last10_s": round(lb_last10, 3),
            "wall_flatness": round(lb_last10 / lb_first10, 2),
            "replay_skipped_by_watermark": lb_replay_ok,
            "stream_equals_batch": lb_match,
            "quantiles_equal": lb_q_match,
            "final_on_disk": lb_files,
            "keep_versions": KEEP_VERSIONS,
            "per_batch": lb_timings,
            # r13 instrumentation: slope attribution inputs.
            "state_rows_first": lb_state_track[0]["state_rows"],
            "state_rows_last": lb_state_track[-1]["state_rows"],
            "versions_max": max(t["versions"] for t in lb_state_track),
            "data_files_max": max(t["data_files"] for t in lb_state_track),
            "per_batch_state": lb_state_track,
        }
        lb_bounded = (
            lb_files["data_files"] <= 2 * KEEP_VERSIONS
            and lb_files["manifests"] <= 2 * KEEP_VERSIONS + 1
        )
        ok = ok and lb_replay_ok and lb_match and lb_q_match and lb_bounded
        ok = ok and lb_last10 <= 2.5 * lb_first10

        # ------------- session-aging control (r13): fresh-state KMV x10
        # Re-run the exact first-10 shape of the KMV fold (empty state,
        # same slice sizes) on the now-aged session. If THIS reads high
        # versus the morning's first10, the late-soak slope is session/
        # JVM aging, not anything the folds accumulate.
        kmv2_path = os.path.join(tmp, "kmv_state_recheck")
        src_e10 = os.path.join(tmp, "src_events10")
        for i in range(10):
            events.filter(
                F.pmod(F.col("event_id"), n_batches) == i
            ).coalesce(1).write.mode("append").parquet(src_e10)
        kmv2_apply = foreach_batch_bottomk_merge_grouped(
            kmv2_path,
            "user_id",
            ["event_type"],
            k=KMV_K,
            keep_versions=KEEP_VERSIONS,
        )
        kmv2_timings = run_fold_stream(
            spark, EVENTS, src_e10, os.path.join(tmp, "ckpt_kmv2"),
            kmv2_apply,
        )
        kmv2_median = statistics.median([t["wall_s"] for t in kmv2_timings])
        results["session_aging_control"] = {
            "kmv_fresh_state_10_median_s": round(kmv2_median, 3),
            "kmv_first10_median_s": round(kmv_first10, 3),
            "aging_factor": round(kmv2_median / kmv_first10, 2),
            "per_batch": kmv2_timings,
        }

        # ---------------- streaming IVF index fold over embeddings (r13)
        from ssg_etl_spark.operators import similarity
        from ssg_etl_spark.schemas import EMBEDDINGS
        from ssg_etl_spark.sources.versioning import commit_snapshot
        from ssg_etl_spark.streaming.pipeline import foreach_batch_ivf_append

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        src_v = os.path.join(tmp, "src_emb")
        for i in range(n_batches):
            emb.filter(F.pmod(F.col("vec_id"), n_batches) == i).coalesce(
                1
            ).write.mode("append").parquet(src_v)

        # Offline: centroids frozen from the full corpus; cells seeded
        # EMPTY (the fold owns every assignment in this soak).
        idx = similarity.build_ivf_index(emb, n_cells=8)
        cent_path = os.path.join(tmp, "ivf_centroids")
        cells_path = os.path.join(tmp, "ivf_cells")
        idx["centroids"].write.parquet(cent_path)
        commit_snapshot(
            similarity.ivf_assign(idx["centroids"], emb.limit(0)),
            cells_path,
            mode="append",
            meta={"max_batch_id": -1},
        )

        ivf_apply = foreach_batch_ivf_append(
            cent_path,
            cells_path,
            keep_versions=KEEP_VERSIONS,
            compact_every=IVF_COMPACT_EVERY,
        )
        ivf_timings = run_fold_stream(
            spark, EMBEDDINGS, src_v, os.path.join(tmp, "ckpt_ivf"),
            ivf_apply,
        )

        # Mid-history replay: the manifest watermark must skip it
        # (appends are NOT idempotent — the skip is the guarantee).
        before = snapshot_signature(spark, cells_path)
        ivf_apply(
            emb.filter(F.pmod(F.col("vec_id"), n_batches) == 7), batch_id=7
        )
        ivf_replay_ok = snapshot_signature(spark, cells_path) == before

        # Probe equality: streamed index == one-shot batch assignment.
        from ssg_etl_spark.sources.versioning import read_snapshot

        cents = spark.read.parquet(cent_path)
        queries = emb.filter("vec_id % 25 = 0").selectExpr(
            "vec_id AS query_id", "embedding AS query_vec"
        )
        stream_probe = sorted(
            tuple(r)
            for r in similarity.ivf_topk_vs_index(
                cents, read_snapshot(spark, cells_path), queries, k=5
            ).collect()
        )
        batch_probe = sorted(
            tuple(r)
            for r in similarity.ivf_topk_vs_index(
                cents, similarity.ivf_assign(cents, emb), queries, k=5
            ).collect()
        )
        ivf_match = stream_probe == batch_probe

        walls = [t["wall_s"] for t in ivf_timings]
        ivf_first10, ivf_last10 = (
            statistics.median(walls[:10]),
            statistics.median(walls[-10:]),
        )
        ivf_files = count_files(cells_path)
        results["folds"]["ivf_append"] = {
            "batches": len(ivf_timings),
            "wall_median_first10_s": round(ivf_first10, 3),
            "wall_median_last10_s": round(ivf_last10, 3),
            "wall_flatness": round(ivf_last10 / ivf_first10, 2),
            "replay_skipped_by_watermark": ivf_replay_ok,
            "probe_equals_batch": ivf_match,
            "final_on_disk": ivf_files,
            "keep_versions": KEEP_VERSIONS,
            "per_batch": ivf_timings,
        }
        # Append-mode retention: deltas commit as ONE coalesced file each
        # and inline compaction rewrites the chain every
        # IVF_COMPACT_EVERY versions, so the steady-state data-file
        # count is bounded by the compaction interval + retained
        # history, independent of batch count (the r13 soak measured
        # 32 files/commit and O(batches) growth before this fold
        # coalesced + compacted).
        ivf_bounded = (
            ivf_files["data_files"] <= IVF_COMPACT_EVERY + 2 * KEEP_VERSIONS
            and ivf_files["manifests"] <= 2 * KEEP_VERSIONS + 1
        )
        ok = ok and ivf_replay_ok and ivf_match and ivf_bounded
        ok = ok and ivf_last10 <= 2.5 * ivf_first10

        results["pass"] = bool(ok)
        out_path = os.path.join(REPO, "tools", "sketch_fold_soak_r13.json")
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        for name, r in results["folds"].items():
            print(
                f"{name}: batches={r['batches']} wall "
                f"{r['wall_median_first10_s']}/{r['wall_median_last10_s']}s "
                f"(x{r['wall_flatness']}) on-disk="
                f"{r['final_on_disk']['data_files']}d/"
                f"{r['final_on_disk']['manifests']}m"
            )
        print(f"pass={ok}; wrote {out_path}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
