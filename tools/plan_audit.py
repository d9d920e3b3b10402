"""Physical-plan audit for the headline queries: the ".explain and iterate"
gate made repeatable.

For each audited query, prints a one-line verdict over the properties that
decide 100 TB behavior, derived from the formatted physical plan:

* scan pruning   — ReadSchema column count vs full table width, and whether
                   any PushedFilters reached the parquet scan;
* join strategy  — broadcast vs sort-merge/shuffled-hash counts (forced
                   broadcasts of SF-proportional tables would show up here
                   as broadcasts whose build side is a big table scan);
* window safety  — flags any WindowExec without partitioning keys
                   (single-partition funnel) and notes WindowGroupLimit
                   rank pushdown;
* python stages  — ArrowEvalPython / FlatMapGroupsInPandas / MapInPandas
                   occurrences (the deliberate pandas operators), and
                   BatchEvalPython (row-at-a-time UDFs — always a bug here).

Usage:  python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

AUDIT_DEFAULT = [
    "gl_enrichment",
    "seven_way_join",
    "top_products",
    "product_association",
    "running_total_by_nation",
    "asof_last_before",
    "window_rownum_global",
    "yoy_monthly_sales",
    "rollup_grouping_sets",
    "events_10min_window",
    "dedup_minhash_lsh",
    "embedding_cosine_topk",
    "valuation_recompute",
    "merge_upsert",
    "cdc_batch_apply",
]


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit_one(name: str, plan: str) -> list[str]:
    notes: list[str] = []

    scans = re.findall(r"Scan parquet[^\n]*", plan)
    read_schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    n_pushed = sum(1 for p in pushed if p.strip())
    col_counts = [len([c for c in rs.split(",") if c.strip()]) for rs in read_schemas]
    notes.append(
        f"scans={len(scans)} read_cols={col_counts} pushed_filter_scans={n_pushed}"
    )

    bhj = len(re.findall(r"BroadcastHashJoin", plan))
    smj = len(re.findall(r"SortMergeJoin", plan))
    shj = len(re.findall(r"ShuffledHashJoin", plan))
    bnl = len(re.findall(r"BroadcastNestedLoopJoin", plan))
    notes.append(f"joins: broadcast={bhj} sortmerge={smj} shuffledhash={shj} nestedloop={bnl}")

    # Window without "partitionBy"-style keys: formatted plan prints
    # `Arguments: [sortkeys], [partkeys], ...` for Window nodes; an empty
    # partition spec shows as `, [], `. Cheap proxy: count Window nodes and
    # empty partition specs adjacent to them.
    n_window = len(re.findall(r"\bWindow\b", plan))
    n_wgl = len(re.findall(r"WindowGroupLimit", plan))
    single_part = len(re.findall(r"Window[^\n]*\n(?:[^\n]*\n)*?[^\n]*Arguments: \[[^\]]*\], \[\]", plan))
    w = f"windows={n_window} group_limit={n_wgl}"
    if single_part:
        w += f" SINGLE_PARTITION={single_part} <-- FIX"
    notes.append(w)

    pandas_ops = len(
        re.findall(r"FlatMapGroupsInPandas|MapInPandas|ArrowEvalPython", plan)
    )
    row_udfs = len(re.findall(r"BatchEvalPython", plan))
    p = f"pandas_stages={pandas_ops}"
    if row_udfs:
        p += f" ROW_UDF={row_udfs} <-- FIX"
    notes.append(p)

    exchanges = len(re.findall(r"\bExchange\b", plan))
    reuses = len(re.findall(r"ReusedExchange", plan))
    notes.append(f"exchanges={exchanges} reused={reuses}")
    return notes


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    only = sys.argv[2:] or AUDIT_DEFAULT

    from ssg_etl_spark.plans.registry import load_all
    from ssg_etl_spark.session import get_spark

    spark = get_spark("plan_audit", master="local[8]", shuffle_partitions=8)
    specs = load_all(include_extra=True)
    bad = 0
    for name in only:
        if name not in specs:
            print(f"??    {name}: unknown query")
            bad += 1
            continue
        plan = formatted_plan(specs[name].builder(spark, sf_dir))
        notes = audit_one(name, plan)
        flag = any("<-- FIX" in n for n in notes)
        bad += int(flag)
        print(("FLAG  " if flag else "ok    ") + name)
        for n in notes:
            print(f"        {n}")
    print(f"\n{len(only) - bad} ok, {bad} flagged")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
