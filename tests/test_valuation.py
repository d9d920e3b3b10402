"""Stateful valuation recompute vs a pure-Python oracle."""

from __future__ import annotations

from ssg_etl_spark.operators.valuation import valuation_recompute
from ssg_etl_spark.sources.tables import load_table


def python_oracle(rows):
    """Reference recurrence, straight-line Python (mirrors the reference's
    loop in item_valuation_update.py:184-243)."""
    out = {}
    groups = {}
    for r in sorted(rows, key=lambda r: (r["part"], r["supp"], r["ts"], r["ok"], r["ln"])):
        groups.setdefault((r["part"], r["supp"]), []).append(r)
    for key, rs in groups.items():
        bal = rate = value = 0.0
        for seq, r in enumerate(rs, 1):
            q, rin = r["qty"], r["price"] / r["qty"]
            if r["flag"] == "N":
                value = value + q * rin
                bal = bal + q
                rate = value / bal if bal != 0.0 else 0.0
            elif r["flag"] == "R":
                bal = bal - q
                value = value - q * rate
            else:
                bal, rate, value = q, rin, q * rin
            out[(key[0], key[1], seq)] = (bal, rate, value)
    return out


def test_valuation_matches_python_oracle(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    rows = [
        {
            "part": r.l_partkey, "supp": r.l_suppkey, "ts": r.l_shipdate,
            "ok": r.l_orderkey, "ln": r.l_linenumber, "flag": r.l_returnflag,
            "qty": r.l_quantity, "price": r.l_extendedprice,
        }
        for r in li.collect()
    ]
    expected = python_oracle(rows)
    got = {
        (r.part_key, r.supp_key, r.seq): (r.balance_qty, r.valuation_rate, r.stock_value)
        for r in valuation_recompute(li, n_buckets=8).collect()
    }
    assert len(got) == len(expected)
    for k, v in expected.items():
        assert got[k] == v, k  # bit-exact: same op order, same doubles


def test_adaptive_bucket_count_grows_with_input():
    from ssg_etl_spark.operators.valuation import ROWS_PER_BUCKET, _adaptive_buckets

    # Small inputs: floor at 2× parallelism so every core gets a bucket.
    assert _adaptive_buckets(10_000, 32) == 64
    # Large inputs: grows linearly so one bucket stays ~ROWS_PER_BUCKET.
    assert _adaptive_buckets(100 * ROWS_PER_BUCKET, 32) == 100
    assert _adaptive_buckets(10_000 * ROWS_PER_BUCKET, 32) == 10_000
    sizes = [_adaptive_buckets(n, 8) for n in (1, 10**5, 10**7, 10**9, 10**11)]
    assert sizes == sorted(sizes)  # monotone
