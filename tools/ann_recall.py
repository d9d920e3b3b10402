"""Measured ANN quality at operational configs: recall@k of every
approximate search path against the brute-force cosine top-k, on the real
fixture at the given scale factor.

The pytest pins assert recall FLOORS at sf0.001; this tool MEASURES the
actual recall at sf0.1 (or any sf) so COVERAGE can state numbers, not
bounds — the approximation paths run at their operational defaults (LSH
auto-scaled bits, IVF default n_probe), not the pinned-exactness oracle
configs.

Usage: python tools/ann_recall.py [sf_dir] [k]
Prints one JSON line: {"path": {"recall_at_k": r, "wall_s": w}, ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def topk_sets(df, k: int) -> dict:
    out: dict = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def recall(exact: dict, approx: dict) -> float:
    rs = [
        len(exact[q] & approx.get(q, set())) / len(exact[q])
        for q in exact
        if exact[q]
    ]
    return round(sum(rs) / len(rs), 4)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import functions as F

    from ssg_etl_spark.cache import release_tracked
    from ssg_etl_spark.operators import similarity
    from ssg_etl_spark.session import get_spark
    from ssg_etl_spark.sources.tables import load_table

    spark = get_spark("ann_recall")
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    queries = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )

    def run(name, thunk):
        t0 = time.time()
        sets = topk_sets(thunk(), k)
        wall = round(time.time() - t0, 2)
        release_tracked()
        return name, sets, wall

    _, exact, exact_wall = run(
        "brute", lambda: similarity.brute_force_topk(emb, queries, k)
    )
    report = {"brute": {"recall_at_k": 1.0, "wall_s": exact_wall}}
    for name, thunk in [
        # Operational defaults — auto-scaled bits, default probe count.
        ("lsh_auto", lambda: similarity.lsh_bucketed_topk(emb, queries, k, n_tables=8)),
        ("ivf_default_probe", lambda: similarity.ivf_topk(emb, queries, k, n_cells=16, n_probe=4)),
        (
            "quantized_int8",
            lambda: similarity.brute_force_topk(
                similarity.dequantize(similarity.quantize_int8(emb)), queries, k
            ),
        ),
    ]:
        _, sets, wall = run(name, thunk)
        report[name] = {"recall_at_k": recall(exact, sets), "wall_s": wall}

    print(json.dumps({"sf_dir": sf_dir, "n_vectors": n, "k": k, "paths": report}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
