"""Shuffle/IO audit: MEASURED bytes per query, not guessed.

The plan audit (`tools/plan_audit.py`) proves the SHAPE of each physical
plan (pruned scans, broadcast joins, no row-UDFs); this tool measures the
VOLUMES: per-query input bytes, shuffle write/read bytes, and spill, pulled
from Spark's status REST API (the same numbers the Spark UI shows). At
100 TB the difference between a 2-pass and 3-pass shuffle plan is the whole
job cost, and shuffle-bytes-per-input-byte is the scale-invariant ratio to
watch: it stays constant as data grows, so measuring it at sf0.1 predicts
the 100 TB shuffle bill.

For every audited query we report:
  input_mb      bytes read from storage (parquet scans, post-pruning)
  shuf_w_mb     shuffle bytes written across all stages
  shuf_r_mb     shuffle bytes read (re-read of the above, AQE-coalesced)
  spill_mb      disk spill (should be 0 at a healthy partition sizing)
  ratio         shuf_w / input — the scale-invariant shuffle amplification

Usage: python tools/shuffle_audit.py [sf_dir] [query ...]
Writes a JSON report to /tmp/shuffle_audit.json and prints a table.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from spark_rest import completed_stages, new_stages_since  # noqa: E402


def audit_query(spark, builder, sf_dir: str) -> dict:
    from ssg_etl_spark.cache import release_tracked

    before = set(completed_stages(spark))
    t0 = time.monotonic()
    try:
        builder(spark, sf_dir).collect()
    finally:
        release_tracked()
    wall = time.monotonic() - t0
    new = list(new_stages_since(spark, before).values())
    mb = 1024.0 * 1024.0
    inp = sum(s.get("inputBytes", 0) for s in new) / mb
    sw = sum(s.get("shuffleWriteBytes", 0) for s in new) / mb
    sr = sum(s.get("shuffleReadBytes", 0) for s in new) / mb
    spill = sum(s.get("diskBytesSpilled", 0) for s in new) / mb
    return {
        "wall_s": round(wall, 2),
        "stages": len(new),
        "input_mb": round(inp, 1),
        "shuf_w_mb": round(sw, 1),
        "shuf_r_mb": round(sr, 1),
        "spill_mb": round(spill, 1),
        "ratio": round(sw / inp, 2) if inp > 0 else None,
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    only = sys.argv[2:]

    import bench
    from ssg_etl_spark.plans.registry import load_all
    from ssg_etl_spark.session import get_spark

    specs = load_all(include_extra=True)
    names = only or (bench.HEADLINE + bench.LLM_FAMILY)
    spark = get_spark("shuffle_audit")

    report: dict[str, dict] = {}
    for name in names:
        if name not in specs:
            print(f"skip {name}: not registered", flush=True)
            continue
        report[name] = audit_query(spark, specs[name].builder, sf_dir)
        r = report[name]
        print(
            f"{name:36s} {r['wall_s']:7.2f}s in={r['input_mb']:8.1f}MB "
            f"sw={r['shuf_w_mb']:8.1f}MB sr={r['shuf_r_mb']:8.1f}MB "
            f"spill={r['spill_mb']:6.1f}MB ratio={r['ratio']}",
            flush=True,
        )

    with open("/tmp/shuffle_audit.json", "w") as f:
        json.dump({"sf_dir": sf_dir, "queries": report}, f, indent=1)
    spills = {n: r["spill_mb"] for n, r in report.items() if r["spill_mb"] > 0}
    print(f"\n{len(report)} queries audited; spilling: {spills or 'none'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
