"""LLM-group contention probe (r10, r9 verdict #7): quantify how much
box load moves the `embedding_near_dup`/`ann_*` family on IDENTICAL code.

Two rounds of driver-side BENCH drift (+9.5% in r9, +3% in r8) hit this
group while quiet-box runs improved. Before accepting or rejecting the
box-noise explanation a third time, measure the counterfactual: run the
same queries median-of-3 on a quiet box, then under a synthetic CPU
antagonist (N busy-spin processes ≈ a co-tenant build job), and record
the per-query contention multiplier. If BENCH_r10 drifts by ≲ the
measured multiplier at plausible co-tenancy, the noise explanation is
EVIDENCED; if it drifts more, the queries own the regression.

Usage: python tools/llm_contention_probe.py [n_antagonists] [trials]
Writes tools/llm_contention_r10.json.
"""

from __future__ import annotations

import json
import multiprocessing
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# The drift-suspect queries (BENCH LLM group members the verdict names)
# plus one stable control from the same group.
QUERIES = [
    "embedding_near_dup",
    "ann_lsh_topk_auto",
    "ann_ivf_probe",
    "ann_quantized_topk",
    "semantic_decontamination",
    "dedup_minhash_lsh",  # control: same group, never flagged
]


def _burn(stop_flag_path: str) -> None:
    x = 1.0
    while not os.path.exists(stop_flag_path):
        x = (x * 1.000000119) % 1e9


def run_group(spark, qs, sf_dir: str, trials: int) -> dict[str, float]:
    from ssg_etl_spark.cache import release_tracked

    out = {}
    for name in QUERIES:
        walls = []
        for _ in range(trials):
            t0 = time.time()
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            walls.append(time.time() - t0)
            release_tracked()
        out[name] = round(statistics.median(walls), 3)
    return out


def main() -> int:
    n_antagonists = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from ssg_etl_spark.plans.registry import load_all
    from ssg_etl_spark.session import get_spark

    spark = get_spark("llm_contention_probe")
    qs = {n: s.builder for n, s in load_all(include_extra=True).items()}
    # Warm-up.
    qs["kpi_totals"](spark, sf_dir).write.mode("overwrite").format("noop").save()

    quiet = run_group(spark, qs, sf_dir, trials)
    print("quiet:", quiet, flush=True)

    stop_flag = f"/tmp/llm_probe_stop_{os.getpid()}"
    burners = [
        multiprocessing.Process(target=_burn, args=(stop_flag,), daemon=True)
        for _ in range(n_antagonists)
    ]
    for b in burners:
        b.start()
    try:
        loaded = run_group(spark, qs, sf_dir, trials)
    finally:
        with open(stop_flag, "w") as f:
            f.write("stop")
        for b in burners:
            b.join(timeout=10)
        os.unlink(stop_flag)
    print("loaded:", loaded, flush=True)

    mult = {n: round(loaded[n] / quiet[n], 2) for n in QUERIES}
    results = {
        "n_antagonists": n_antagonists,
        "cpus": os.cpu_count(),
        "trials": trials,
        "sf_dir": sf_dir,
        "quiet_s": quiet,
        "loaded_s": loaded,
        "contention_multiplier": mult,
        "note": (
            "multiplier = median wall under N busy-spin antagonist "
            "processes / quiet median, identical code and data. Use as "
            "the noise envelope when reading driver-box BENCH deltas "
            "for this group."
        ),
    }
    out_path = os.path.join(REPO, "tools", "llm_contention_r10.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("multipliers:", mult)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
