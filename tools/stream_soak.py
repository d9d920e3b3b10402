"""Sustained-rate streaming soak (r10, r9 verdict #8): the operational
claim the inline-compaction committer was built for, measured.

A minutes-cadence micro-batch committer's failure mode at 100 TB is not
data volume — it is unbounded accumulation: one data file and one
manifest per batch forever, with per-batch wall creeping as listings
grow. This soak drives the quality-gated snapshot committer
(``foreach_batch_quality_gate``) through ≥50 file-source micro-batches
with inline compaction ON and a periodic vacuum (the deployment recipe:
compaction bounds the LIVE version's file count, retention bounds the
version history), then asserts the operational envelope:

  * latest-version data-file count stays < compact_every at the end
    (compaction kept firing, not just once);
  * total on-disk files (data + manifests) are bounded by the retention
    window, not by batch count;
  * per-batch wall is FLAT: median of the last 10 STEADY-STATE batches
    (no inline compaction fired, no vacuum ran) within 2.5× the median of
    the first 10 (no listing/manifest creep); compaction-batch walls are
    reported separately (their rewrite cost is the feature, not creep);
  * zero rows lost: target + quarantine row counts == input rows, and
    the quarantine carries exactly the rule-failing rows.

Usage: python tools/stream_soak.py [n_batches]   (default 60)
Writes tools/stream_soak_r10.json (per-batch timings + file counts).
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

COMPACT_EVERY = 8
VACUUM_EVERY = 10
VACUUM_KEEP = 5


def main() -> int:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    from pyspark.sql import functions as F

    from ssg_etl_spark.schemas import EVENTS
    from ssg_etl_spark.session import get_spark
    from ssg_etl_spark.sources import versioning
    from ssg_etl_spark.streaming.pipeline import foreach_batch_quality_gate

    spark = get_spark("stream_soak")
    tmp = tempfile.mkdtemp(prefix="soak_")
    src = os.path.join(tmp, "src")
    target = os.path.join(tmp, "target")
    quarantine = os.path.join(tmp, "quarantine")

    # n_batches single-file slices of the sf0.001 events table (file
    # source + maxFilesPerTrigger=1 → one micro-batch per slice).
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    n_rows = events.count()
    for i in range(n_batches):
        events.filter(F.pmod(F.col("event_id"), n_batches) == i).coalesce(
            1
        ).write.mode("append").parquet(src)

    rules = {"value_in_range": "value IS NOT NULL AND value <= 300.0"}
    gate = foreach_batch_quality_gate(
        target,
        quarantine,
        rules,
        compact_every=COMPACT_EVERY,
        target_file_bytes=64 * 1024 * 1024,
    )

    timings: list[dict] = []

    def count_files(*paths: str) -> dict:
        data, manifests = 0, 0
        for path in paths:
            for _root, _dirs, names in os.walk(path):
                for n in names:
                    if n.endswith(".parquet"):
                        data += 1
                    elif n.endswith(".json"):
                        manifests += 1
        return {"data_files": data, "manifests": manifests}

    def timed_gate(batch, batch_id):
        versions_before = len(versioning.snapshot_versions(target))
        t0 = time.monotonic()
        gate(batch, batch_id)
        wall = time.monotonic() - t0
        # The gate commits one append version; a second new version in the
        # same batch means inline compaction fired.
        compacted = (
            len(versioning.snapshot_versions(target)) - versions_before >= 2
        )
        vacuumed = False
        # Deployment recipe: periodic retention bounds the version log.
        if (batch_id + 1) % VACUUM_EVERY == 0:
            versioning.vacuum_snapshots(target, keep_last=VACUUM_KEEP)
            versioning.vacuum_snapshots(quarantine, keep_last=VACUUM_KEEP)
            vacuumed = True
        live = versioning.snapshot_file_count(target)
        timings.append(
            {
                "batch_id": batch_id,
                "wall_s": round(wall, 3),
                "live_version_files": live,
                "compacted": compacted,
                "vacuumed": vacuumed,
                **count_files(target, quarantine),
            }
        )

    t0 = time.monotonic()
    q = (
        spark.readStream.schema(EVENTS)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(timed_gate)
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    total_wall = time.monotonic() - t0

    got_batches = len(timings)
    target_rows = versioning.read_snapshot(spark, target).count()
    quar_rows = (
        versioning.read_snapshot(spark, quarantine).count()
        if versioning.snapshot_versions(quarantine)
        else 0
    )
    expect_bad = events.filter(
        ~((F.col("value").isNotNull()) & (F.col("value") <= 300.0))
    ).count()

    walls = [
        t["wall_s"] for t in timings if not t["vacuumed"] and not t["compacted"]
    ]
    compact_walls = [t["wall_s"] for t in timings if t["compacted"]]
    first10 = statistics.median(walls[:10])
    last10 = statistics.median(walls[-10:])
    final_live = timings[-1]["live_version_files"]
    final_files = timings[-1]
    results = {
        "n_batches": got_batches,
        "total_wall_s": round(total_wall, 1),
        "rows": {
            "input": n_rows,
            "target": target_rows,
            "quarantine": quar_rows,
            "expected_quarantine": expect_bad,
        },
        "wall_median_first10_s": round(first10, 3),
        "wall_median_last10_s": round(last10, 3),
        "wall_flatness": round(last10 / first10, 2),
        "n_compaction_batches": len(compact_walls),
        "compaction_wall_max_s": round(max(compact_walls), 3)
        if compact_walls
        else None,
        "final_live_version_files": final_live,
        "final_on_disk": {
            "data_files": final_files["data_files"],
            "manifests": final_files["manifests"],
        },
        "compact_every": COMPACT_EVERY,
        "vacuum_every": VACUUM_EVERY,
        "vacuum_keep": VACUUM_KEEP,
        "per_batch": timings,
    }
    ok = (
        got_batches >= 50
        and target_rows + quar_rows == n_rows
        and quar_rows == expect_bad
        and final_live <= COMPACT_EVERY
        and len(compact_walls) >= 2  # compaction kept firing, not just once
        and last10 <= 2.5 * first10
    )
    results["pass"] = ok
    out_path = os.path.join(REPO, "tools", "stream_soak_r10.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(
        f"batches={got_batches} wall first10/last10 median "
        f"{first10:.3f}/{last10:.3f}s (x{last10 / first10:.2f}) "
        f"live files={final_live} on-disk data/manifests="
        f"{final_files['data_files']}/{final_files['manifests']} "
        f"rows in/target/quarantine={n_rows}/{target_rows}/{quar_rows} "
        f"pass={ok}"
    )
    print(f"wrote {out_path}")
    shutil.rmtree(tmp, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
