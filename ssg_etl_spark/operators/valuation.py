"""Stateful running weighted-average valuation (SURVEY §2.5 W6) — the
reference's hardest operator.

Re-expresses scripts/test/item_valuation_update.py:160-243: per
(item, warehouse), ordered by posting time, carry a running balance
quantity, moving-average valuation rate, and stock value, with per-row
branching on voucher type:

* receipt        → value += qty·rate_in; bal += qty; avg = value/bal
* issue          → bal -= qty; value -= qty·avg (avg unchanged)
* reconciliation → reset: bal = qty; avg = rate_in; value = qty·rate_in

The recurrence feeds each row's output into the next row's input, so it is
not expressible as a window function. Spark-first form: grouped-map
``applyInPandas`` — each key group is processed by a vectorized-transfer
pandas function with a sequential loop inside (SNIPPETS.md patterns [1]-[3]).

Scale: one shuffle on the group key; groups process in parallel across
executors. Arrow batches keep the transfer cheap, but each grouped-map call
materializes ONE whole bucket (≈ table/n_buckets rows) in a Python worker —
size ``n_buckets`` so a bucket fits executor memory (rows·width/n_buckets ≲
worker heap); for very large ledgers raise n_buckets, or group directly by
the natural key to bound memory by per-key history at the cost of one
grouped-map call per key.

Testdata mapping (FIXTURES.md §6): lineitem per (l_partkey, l_suppkey)
ordered by (l_shipdate, l_orderkey, l_linenumber); voucher type from
l_returnflag: N→receipt, R→issue, A→reconciliation;
rate_in = l_extendedprice / l_quantity.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

VALUATION_SCHEMA = T.StructType(
    [
        T.StructField("part_key", T.LongType()),
        T.StructField("supp_key", T.LongType()),
        T.StructField("seq", T.IntegerType()),
        T.StructField("voucher_type", T.StringType()),
        T.StructField("qty", T.DoubleType()),
        T.StructField("rate_in", T.DoubleType()),
        T.StructField("balance_qty", T.DoubleType()),
        T.StructField("valuation_rate", T.DoubleType()),
        T.StructField("stock_value", T.DoubleType()),
    ]
)


def _recompute_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
    """Ordered sequential state machine over one hash-bucket of key groups.

    Mirrors the reference's while-loop (item_valuation_update.py:184-243):
    three voucher-type branches updating (bal, avg_rate, value) in order,
    with the state reset whenever the (part, supplier) key changes.

    Processing whole buckets (many groups per pandas call) instead of one
    call per group keeps the Python/Arrow crossing count proportional to
    partitions, not keys — with millions of keys at full scale, per-group
    grouped-map overhead dominates otherwise.
    """
    pdf = pdf.sort_values(
        ["part_key", "supp_key", "ship_ts", "order_key", "line_number"],
        kind="mergesort",
    )
    parts = pdf["part_key"].to_numpy()
    supps = pdf["supp_key"].to_numpy()
    flags = pdf["flag"].to_numpy()
    qtys = pdf["qty"].to_numpy()
    rates_in = pdf["rate_in"].to_numpy()

    n = len(pdf)
    out_bal = [0.0] * n
    out_rate = [0.0] * n
    out_value = [0.0] * n
    seqs = [0] * n

    prev_key = None
    bal = rate = value = 0.0
    seq = 0
    for i in range(n):
        key = (parts[i], supps[i])
        if key != prev_key:
            bal = rate = value = 0.0
            seq = 0
            prev_key = key
        flag, qty, rate_in = flags[i], float(qtys[i]), float(rates_in[i])
        if flag == "N":  # receipt: recompute moving average
            value = value + qty * rate_in
            bal = bal + qty
            rate = value / bal if bal != 0.0 else 0.0
        elif flag == "R":  # issue: apply last average rate
            bal = bal - qty
            value = value - qty * rate
        else:  # reconciliation: reset to this row's quantity/rate
            bal = qty
            rate = rate_in
            value = qty * rate_in
        seq += 1
        seqs[i] = seq
        out_bal[i] = bal
        out_rate[i] = rate
        out_value[i] = value

    return pd.DataFrame(
        {
            "part_key": parts,
            "supp_key": supps,
            "seq": seqs,
            "voucher_type": flags,
            "qty": qtys,
            "rate_in": rates_in,
            "balance_qty": out_bal,
            "valuation_rate": out_rate,
            "stock_value": out_value,
        }
    )


# Target rows materialized per grouped-map call: ~200k rows × ~80 B/row ≈
# 16 MB per pandas bucket — bounded well under a Python worker's memory.
ROWS_PER_BUCKET = 200_000


def _adaptive_buckets(n_rows: int, parallelism: int) -> int:
    """Bucket count that (a) bounds each pandas call to ~ROWS_PER_BUCKET
    rows regardless of input size and (b) never drops below 2× the cluster
    parallelism (so every core gets work). Monotone in ``n_rows``."""
    by_size = -(-n_rows // ROWS_PER_BUCKET)  # ceil
    return max(2 * max(parallelism, 1), by_size, 1)


def _estimate_rows(df: DataFrame) -> int:
    """Input row estimate WITHOUT running a job: Catalyst plan statistics
    (parquet footer counts / CBO estimates). Over-estimates are safe — they
    only make buckets smaller. Falls back to ``count()`` (cheap for raw
    parquet scans: metadata-only) if stats are unavailable."""
    try:
        stats = df._jdf.queryExecution().optimizedPlan().stats()
        rc = stats.rowCount()
        if rc.isDefined():
            return max(int(str(rc.get())), 1)
        # ~64 B/row floor keeps the estimate conservative (more buckets).
        return max(int(str(stats.sizeInBytes())) // 64, 1)
    except Exception:  # noqa: BLE001 — private API; any change → safe path
        return max(df.count(), 1)


def valuation_recompute(lineitem: DataFrame, n_buckets: int | None = None) -> DataFrame:
    """Run the stateful recompute over every (part, supplier) stock ledger.

    Keys are hashed into ``n_buckets`` coarse groups; each grouped-map call
    then walks all of its (whole) key groups sequentially. A key never
    splits across buckets, so semantics equal per-key processing.

    ``n_buckets`` defaults to adaptive: a plan-statistics row estimate (no
    extra job — important when the input is a derived join/filter, which a
    ``count()`` would recompute end-to-end) sizes the bucket count so one
    bucket stays ~ROWS_PER_BUCKET rows at ANY input scale (a fixed constant
    would materialize rows/256 per Python worker — unbounded at 100 TB).
    Pass an explicit value to pin it.
    """
    from pyspark.sql import functions as F

    if n_buckets is None:
        n_buckets = _adaptive_buckets(
            _estimate_rows(lineitem),
            lineitem.sparkSession.sparkContext.defaultParallelism,
        )

    prepared = lineitem.select(
        F.col("l_partkey").alias("part_key"),
        F.col("l_suppkey").alias("supp_key"),
        F.col("l_shipdate").alias("ship_ts"),
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_number"),
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").alias("qty"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("rate_in"),
        F.pmod(F.hash("l_partkey", "l_suppkey"), F.lit(n_buckets)).alias("bucket"),
    )
    out = prepared.groupBy("bucket").applyInPandas(
        lambda pdf: _recompute_bucket(pdf), VALUATION_SCHEMA
    )
    return out


# DuckDB oracle: the same recurrence as a recursive CTE stepping rn → rn+1
# within each key group. Group sizes in the testdata are small (a handful of
# rows per (part, supplier)), so the recursion depth is shallow. Float
# arithmetic follows the exact same operation order as the pandas loop, so
# doubles match bit-for-bit.
VALUATION_ORACLE = """
WITH RECURSIVE base AS (
  SELECT l_partkey AS part_key, l_suppkey AS supp_key,
    row_number() OVER (
      PARTITION BY l_partkey, l_suppkey
      ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn,
    l_returnflag AS flag, l_quantity AS qty,
    l_extendedprice / l_quantity AS rate_in
  FROM lineitem
),
walk AS (
  SELECT part_key, supp_key, rn, flag, qty, rate_in,
    CASE flag WHEN 'N' THEN qty WHEN 'R' THEN 0.0 - qty ELSE qty END AS bal,
    CASE flag WHEN 'N' THEN (qty * rate_in) / qty
              WHEN 'R' THEN 0.0
              ELSE rate_in END AS rate,
    CASE flag WHEN 'N' THEN qty * rate_in
              WHEN 'R' THEN 0.0 - qty * 0.0
              ELSE qty * rate_in END AS value
  FROM base WHERE rn = 1
  UNION ALL
  SELECT b.part_key, b.supp_key, b.rn, b.flag, b.qty, b.rate_in,
    CASE b.flag WHEN 'N' THEN w.bal + b.qty
                WHEN 'R' THEN w.bal - b.qty
                ELSE b.qty END,
    CASE b.flag
      WHEN 'N' THEN CASE WHEN w.bal + b.qty <> 0.0
                         THEN (w.value + b.qty * b.rate_in) / (w.bal + b.qty)
                         ELSE 0.0 END
      WHEN 'R' THEN w.rate
      ELSE b.rate_in END,
    CASE b.flag WHEN 'N' THEN w.value + b.qty * b.rate_in
                WHEN 'R' THEN w.value - b.qty * w.rate
                ELSE b.qty * b.rate_in END
  FROM base b
  JOIN walk w ON b.part_key = w.part_key AND b.supp_key = w.supp_key
             AND b.rn = w.rn + 1
)
SELECT part_key, supp_key, rn AS seq, flag AS voucher_type, qty, rate_in,
  bal AS balance_qty, rate AS valuation_rate, value AS stock_value
FROM walk
"""
