"""Z-order (Morton curve) clustering keys for multi-dimensional data
skipping (BASELINE.json north-star extension — no reference twin; the
lakehouse counterpart is Delta's OPTIMIZE ZORDER BY).

Why it matters at 100 TB: parquet row-group/file min-max statistics prune
scans on ONE sort dimension; a corpus queried by several dimensions
(price AND customer, date AND domain) keeps tight min-max ranges on ALL
of them only if the layout interleaves the dimensions. The Morton key
does exactly that: each dimension is quantized to ``bits`` cells between
its min and max, and the cell bits are interleaved into one long —
points close in every dimension are close on the curve, so range-sorting
files by the key yields files that are simultaneously narrow in every
participating column.

Scale shape: one 1-row min/max aggregate (broadcast back), pure column
arithmetic for cell + interleave (whole-stage codegen, no UDF), and a
``repartitionByRange`` write — range boundaries come from sampling, no
single-task global sort. The quantization is engine-portable double
arithmetic (subtract/divide/multiply/floor — IEEE-identical in DuckDB),
so the oracle replays keys bit-for-bit.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cell(v: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Quantize ``v`` to an integer cell in [0, 2^bits): equal-width
    bins between the column min and max, top value clamped into the last
    cell, NULLs and degenerate (constant) columns to cell 0. The
    arithmetic is (v-mn)/(mx-mn)*2^bits then floor — the oracle must
    replay the identical operation order (IEEE doubles are deterministic
    per-operation, not across algebraic rewrites)."""
    n_cells = float(1 << bits)
    raw = F.floor((v - mn) / (mx - mn) * F.lit(n_cells))
    clamped = F.least(raw, F.lit((1 << bits) - 1)).cast("long")
    return F.when(v.isNull() | (mx == mn), F.lit(0)).otherwise(clamped)


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 8, out_col: str = "zorder"
) -> DataFrame:
    """Append a Morton-interleaved clustering key over ``cols``.

    Each column is quantized against its own global min/max (one 1-row
    aggregate, broadcast back with a crossJoin — dimension-sized, never a
    shuffle of the fact side), then bit b of every cell lands at
    interleaved position ``b * len(cols) + i``. ``bits * len(cols)`` must
    fit a long (≤ 63). The interleave is a fixed chain of
    shift/and/shiftleft column ops — JVM codegen, no UDF.
    """
    if not cols:
        raise ValueError("cols must name at least one column")
    if bits * len(cols) > 63:
        raise ValueError("bits * len(cols) must be <= 63")
    aggs = []
    for i, c in enumerate(cols):
        v = F.col(c).cast("double")
        aggs += [F.min(v).alias(f"_mn{i}"), F.max(v).alias(f"_mx{i}")]
    mm = df.agg(*aggs)
    with_mm = df.crossJoin(F.broadcast(mm))
    cells = [
        _cell(
            F.col(c).cast("double"),
            F.col(f"_mn{i}"),
            F.col(f"_mx{i}"),
            bits,
        )
        for i, c in enumerate(cols)
    ]
    n = len(cols)
    terms = [
        F.shiftleft(F.shiftright(cell, b).bitwiseAND(F.lit(1)), b * n + i)
        for b in range(bits)
        for i, cell in enumerate(cells)
    ]
    z = reduce(lambda a, t: a.bitwiseOR(t), terms)
    return with_mm.select(
        *[F.col(c) for c in df.columns], z.alias(out_col)
    )


def zorder_export(
    df: DataFrame,
    cols: list[str],
    path: str,
    num_files: int = 32,
    bits: int = 8,
) -> None:
    """Write ``df`` range-clustered by its Morton key: files hold
    contiguous, non-overlapping z-ranges, so every participating
    dimension keeps tight per-file min-max statistics for scan pruning.
    ``repartitionByRange`` samples range boundaries — no global
    single-task sort; ``sortWithinPartitions`` orders rows inside each
    file for row-group-level pruning too."""
    keyed = zorder_key(df, cols, bits=bits)
    (
        keyed.repartitionByRange(num_files, "zorder")
        .sortWithinPartitions("zorder")
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_oracle_sql(
    table: str, key_col: str, cols: list[str], bits: int = 8
) -> str:
    """Generate the DuckDB replay of :func:`zorder_key` for ``cols`` —
    the identical quantization arithmetic and an addition-chain interleave
    (bit positions are disjoint, so ``+`` equals OR)."""
    mm = ", ".join(
        f"min(CAST({c} AS DOUBLE)) AS mn{i}, "
        f"max(CAST({c} AS DOUBLE)) AS mx{i}"
        for i, c in enumerate(cols)
    )
    n_cells = 1 << bits
    cells = ", ".join(
        f"CASE WHEN {c} IS NULL OR mx{i} = mn{i} THEN 0 ELSE "
        f"CAST(LEAST(FLOOR((CAST({c} AS DOUBLE) - mn{i}) / (mx{i} - mn{i})"
        f" * {n_cells}.0), {n_cells - 1}) AS BIGINT) END AS c{i}"
        for i, c in enumerate(cols)
    )
    n = len(cols)
    terms = " + ".join(
        f"(((c{i} >> {b}) & 1) << {b * n + i})"
        for b in range(bits)
        for i in range(n)
    )
    return (
        f"WITH mm AS (SELECT {mm} FROM {table}),\n"
        f"cells AS (SELECT {key_col}, {cells} FROM {table}, mm)\n"
        f"SELECT {key_col}, {terms} AS zorder FROM cells"
    )
