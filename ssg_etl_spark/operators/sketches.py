"""Mergeable distinct-count sketches: a deterministic HyperLogLog built
from engine-portable primitives (md5 + string/integer ops only), so the
DuckDB oracle replays the EXACT register state and estimate — unlike
``approx_count_distinct`` (Spark's HLL++), whose register layout is an
engine internal no other engine can reproduce.

Why a sketch at all: at 100 TB, ``COUNT(DISTINCT user)`` per group
shuffles every distinct (group, user) pair; the sketch shuffles at most
``m = 2^p`` register rows per group (fixed bytes, map-side combinable via
MAX) and register tables MERGE across days/partitions/streams — the
classic pre-aggregated-rollup trick for distinct counts.

Determinism contract (everything the estimate touches is exact integer or
same-fold double math):

- register index = first ``p=8`` bits of ``md5(value)`` (hex prefix);
- rho = leading-zero count of the next 48 bits + 1, computed by STRING
  inspection of the hex digest (regexp leading-zeros + a 16-way CASE on
  the first non-zero nibble) — no floating log anywhere;
- harmonic denominator = ``Σ 2^(49-rho)`` as an exact BIGINT (scaling by
  2^49 turns the fractional harmonic sum into integer arithmetic; max
  256·2^49 < 2^63);
- the only non-integer steps are one double division and (small-range
  linear counting) one ``ln`` on a ratio of exact integers, rounded to 4
  decimals — within cross-engine libm tolerance.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_P = 8  # 2^8 = 256 registers per sketch
HLL_M = 1 << HLL_P
HLL_RHO_HEX = 12  # 48 bits of rho material
HLL_RHO_MAX = 4 * HLL_RHO_HEX + 1
_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# alpha * m^2 * 2^49: the estimate numerator pre-scaled by the same 2^49
# the integer denominator carries (2^(49-rho) is integral for the whole
# rho range 1..49, and an empty register contributes 2^49 exactly).
# Inlined as one literal so Spark and the SQL oracle fold the identical
# double.
ALPHA_M2_SCALED = _ALPHA * float(HLL_M * HLL_M) * float(1 << HLL_RHO_MAX)
LINEAR_COUNT_CUTOFF = 2.5 * HLL_M


def _rho(hexpart: Column) -> Column:
    """Position of the first 1-bit in the 48-bit value spelled by a
    12-hex-char string, via leading-zero counting on the string: full
    zero nibbles from a regexp, the partial nibble from a CASE on the
    first non-zero hex char. Exact in any engine; no log2."""
    z = F.length(F.regexp_extract(hexpart, "^(0*)", 1))
    # The trailing pad only matters in the all-zeros case, where the CASE
    # above it never consults `first`; substr needs a valid position.
    first = F.substr(F.concat(hexpart, F.lit("f")), z + 1, F.lit(1))
    nibble_lz = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    return (
        F.when(z == HLL_RHO_HEX, F.lit(HLL_RHO_MAX))
        .otherwise(z * 4 + nibble_lz + 1)
        .cast("int")
    )


def hll_registers(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Sketch state per group: ``(group_cols..., reg int, max_rho int)``,
    one row per OCCUPIED register (≤ 256/group regardless of data size).
    The aggregation is MAX — map-side combinable, so the shuffle carries
    at most 256 rows per (group, input-partition).

    NULL values are ignored, matching the ``COUNT(DISTINCT ..)`` this
    sketch approximates — md5(NULL) would otherwise occupy a register row
    and shrink the empty-register correction (r7 advisor finding)."""
    digest = F.md5(F.col(value_col).cast("string").cast("binary"))
    reg = F.conv(F.substring(digest, 1, 2), 16, 10).cast("int").alias("reg")
    rho = _rho(F.substring(digest, 3, HLL_RHO_HEX)).alias("_rho")
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, reg, rho)
        .groupBy(*group_cols, "reg")
        .agg(F.max("_rho").alias("max_rho"))
    )


def hll_merge(sketches: list[DataFrame], group_cols: list[str]) -> DataFrame:
    """Merge sketch tables (register-wise MAX) — the property that makes
    the sketch a rollup: per-day/per-partition register tables combine
    into exact union sketches without touching raw data."""
    unioned = reduce(lambda a, b: a.unionByName(b), sketches)
    return unioned.groupBy(*group_cols, "reg").agg(
        F.max("max_rho").alias("max_rho")
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Cardinality estimate from a register table: the standard HLL
    formula with the small-range linear-counting correction (the
    large-range correction is unnecessary at 48 hash bits). Returns
    ``(group_cols..., approx_distinct double)`` rounded to 4 decimals."""
    denom = F.sum(
        F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_MAX} - max_rho)")
    ) + (HLL_M - F.count(F.lit(1))) * F.lit(1 << HLL_RHO_MAX)
    zeros = (HLL_M - F.count(F.lit(1))).cast("double")
    agg = registers.groupBy(*group_cols).agg(
        denom.alias("_denom"), zeros.alias("_zeros")
    )
    raw = F.lit(ALPHA_M2_SCALED) / F.col("_denom").cast("double")
    linear = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("_zeros"))
    est = F.when(
        (raw <= F.lit(LINEAR_COUNT_CUTOFF)) & (F.col("_zeros") > 0.0), linear
    ).otherwise(raw)
    return agg.select(
        *group_cols, F.round(est, 4).alias("approx_distinct")
    )


def approx_distinct(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """HLL distinct estimate per group, end to end."""
    return hll_estimate(hll_registers(df, group_cols, value_col), group_cols)


# --------------------------------------------------------------- count-min

CMS_DEPTH = 4  # independent hash rows
CMS_W_HEX = 2  # 2 hex chars -> width 256 counters per row


def _cms_reg(value: Column, row: int) -> Column:
    """Counter index of ``value`` in hash row ``row``: first CMS_W_HEX hex
    chars of md5 seeded by the row number (engine-portable — the same
    string in any engine hashes to the same cell)."""
    seeded = F.concat(F.lit(f"{row}:"), value.cast("string"))
    return F.conv(
        F.substring(F.md5(seeded.cast("binary")), 1, CMS_W_HEX), 16, 10
    ).cast("int")


def cms_sketch(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Count-min sketch per group: ``(group_cols..., row, reg, cnt)``, at
    most depth x width = 1024 occupied cells per group regardless of data
    size. Counters are SUMs — map-side combinable, and sketch tables from
    disjoint inputs MERGE by cell-wise addition (:func:`cms_merge`), the
    same rollup property the HLL registers have under MAX.

    NULL values are ignored, matching the GROUP BY frequency semantics
    this sketch approximates (``concat`` of a NULL value would otherwise
    count NULLs as a key — r7 advisor finding)."""
    df = df.filter(F.col(value_col).isNotNull())
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("row"),
                    _cms_reg(F.col(value_col), i).alias("reg"),
                )
                for i in range(CMS_DEPTH)
            ]
        )
    ).alias("_cell")
    return (
        df.select(*group_cols, rows)
        .select(*group_cols, "_cell.row", "_cell.reg")
        .groupBy(*group_cols, "row", "reg")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(sketches: list[DataFrame], group_cols: list[str]) -> DataFrame:
    """Cell-wise addition of count-min sketch tables (disjoint inputs)."""
    unioned = reduce(lambda a, b: a.unionByName(b), sketches)
    return unioned.groupBy(*group_cols, "row", "reg").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_lookup(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Frequency estimate for each key: min over hash rows of the key's
    counter cells (the count-min guarantee: est >= true count, with
    overcounts only from collisions). ``keys`` carries one row per
    (group, key); a cell the key never touched reads as 0.

    The join is (group, row, reg)-keyed against a bounded sketch — at
    scale the sketch side is broadcast (<= 1024 rows per group)."""
    group_cols = group_cols or []
    cells = keys.select(
        *group_cols,
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cms_reg(F.col(key_col), i).alias("reg"),
                    )
                    for i in range(CMS_DEPTH)
                ]
            )
        ).alias("_cell"),
    ).select(*group_cols, key_col, "_cell.row", "_cell.reg")
    joined = cells.join(
        F.broadcast(sketch), [*group_cols, "row", "reg"], "left"
    ).withColumn("_c", F.coalesce(F.col("cnt"), F.lit(0)))
    return joined.groupBy(*group_cols, key_col).agg(
        F.min("_c").alias("est_count")
    )
