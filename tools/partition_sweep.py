"""Partition-invariance sweep: every registry query's VALUES must be
identical under any ``spark.sql.shuffle.partitions`` and any scan split
sizing.

Third leg of the session-robustness contract (ANSI on/off →
``tools/check_correctness.py --ansi``; session timeZone →
``tools/tz_sweep.py``). An embedding application brings its own
parallelism: the driver's session defaults to 200 shuffle partitions, a
notebook might set 1, and a production cluster sets thousands — while scan
split counts follow ``spark.sql.files.maxPartitionBytes`` and file layout.
Any of these changes the ORDER rows meet an aggregate, so order-dependent
constructs — double-precision sums (addition is not associative),
``first()``/``collect_list`` without explicit ordering, ``row_number``
with under-specified sort keys, ``limit`` without order — produce
different VALUES at different parallelism and nobody notices until the
cluster run disagrees with the laptop run. The engine contract: results
are a pure function of the input data, not of the physical partitioning
(DECIMAL intermediates for sums, fully-keyed sort orders, hash-derived
tie-breakers).

This sweep executes the full registry once per configuration and compares
canonical value hashes against the baseline run. Configurations exercise a
serial extreme (1 shuffle partition), the engine default (32), a prime
non-divisor (7), and a tiny ``maxPartitionBytes`` that shatters every scan
into many splits.

Usage: python tools/partition_sweep.py [sf_dir] [query ...]
Exit code 1 if any query errors or hash-mismatches under any config.
"""

from __future__ import annotations

import hashlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# (label, shuffle.partitions, files.maxPartitionBytes)
CONFIGS = [
    ("base-32", "32", "134217728"),
    ("serial-1", "1", "134217728"),
    ("prime-7", "7", "134217728"),
    ("splits-64k", "32", "65536"),
]


def canon_hash(df) -> tuple[int, str]:
    """Order-insensitive value hash (rows and columns sorted)."""
    cols = sorted(df.columns)
    rows = df.select(*cols).collect()
    lines = sorted("|".join(repr(r[c]) for c in cols) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return len(rows), h


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from ssg_etl_spark.cache import release_tracked
    from ssg_etl_spark.plans.registry import load_all
    from ssg_etl_spark.session import get_spark

    specs = load_all(include_extra=True)
    if only:
        specs = {k: v for k, v in specs.items() if k in only}

    spark = get_spark("partition_sweep")
    base: dict[str, tuple[int, str]] = {}
    bad: list[str] = []
    for label, nshuf, max_bytes in CONFIGS:
        spark.conf.set("spark.sql.shuffle.partitions", nshuf)
        spark.conf.set("spark.sql.files.maxPartitionBytes", max_bytes)
        for name in sorted(specs):
            try:
                got = canon_hash(specs[name].builder(spark, sf_dir))
            except Exception as exc:  # noqa: BLE001
                got = (-1, f"ERROR {type(exc).__name__}: {exc}")
            finally:
                release_tracked()
            if label == "base-32":
                base[name] = got
                if got[0] < 0:
                    bad.append(f"{name}: errors under base config: {got[1]}")
                    print(f"FAIL {name} [{label}]: {got[1]}", flush=True)
            elif got != base[name]:
                bad.append(f"{name} [{label}]: {base[name]} -> {got}")
                print(
                    f"FAIL {name} [{label}]: base={base[name]} got={got}",
                    flush=True,
                )
        print(f"== config {label}: done ({len(bad)} failures so far)", flush=True)

    print(f"\n{len(specs)} queries x {len(CONFIGS)} configs, {len(bad)} failures")
    for b in bad:
        print("  " + b)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
