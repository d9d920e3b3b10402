"""Synthetic transaction generator source (SURVEY §2.1 S9, §2.8 F10).

The reference generates faker sales transactions on a 1-minute cron
(dags/get_data_faker.py:10-25: uuid, customer, amount, currency, city,
created datetime). Spark-native form: ``spark.range(n)`` — a parallel,
partitioned long sequence — with every field a **deterministic** pure
function of the row id (hash/modulo arithmetic, not RNG), so the generator
is reproducible across engines and runs; the DuckDB oracle replays the
same arithmetic bit-for-bit.

Scale: ``spark.range(n, numPartitions=p)`` manufactures data on executors
with no driver materialization and no shuffle — the pattern scales to any
n (used at 100 TB for load-test corpora).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssg_etl_spark.functions.scalar import utc_wall as _utc_wall

CURRENCIES = ("USD", "EUR", "PKR", "GBP", "JPY")
CITIES = ("Karachi", "Lahore", "Faisalabad", "Sialkot")


def synthetic_transactions(
    spark: SparkSession, n: int = 1000, num_partitions: int | None = None
) -> DataFrame:
    """Deterministic faker-transaction stream of ``n`` rows.

    F10: the surrogate id is ``md5(id)`` — content-derived, unlike
    ``monotonically_increasing_id`` it is stable under repartitioning
    (the reference's uuid4/IDENTITY surrogates are likewise per-row ids,
    dags/ssg_gl_etl.py:470, create_general_ledger_table.sql:2).
    """
    rng = (
        spark.range(0, n, 1, num_partitions)
        if num_partitions
        else spark.range(0, n)
    )
    amount_cents = (F.col("id") * 9973) % 100000
    return rng.select(
        F.col("id").alias("txn_seq"),
        F.md5(F.col("id").cast("string")).alias("txn_id"),
        (amount_cents.cast("double") / F.lit(100.0)).alias("amount"),
        F.element_at(
            F.array(*[F.lit(c) for c in CURRENCIES]),
            ((F.col("id") % len(CURRENCIES)) + 1).cast("int"),
        ).alias("currency"),
        F.element_at(
            F.array(*[F.lit(c) for c in CITIES]),
            ((F.col("id") % len(CITIES)) + 1).cast("int"),
        ).alias("city"),
        # Micros arithmetic, not make_interval(..., mins=id, ...): the
        # interval minutes argument is INT, so id >= 2^31 would silently
        # wrap under non-ANSI casts. bigint micros hold ~292k years of ids.
        _utc_wall(
            F.timestamp_micros(
                # 2024-01-01T00:00:00Z as epoch micros: a FIXED instant.
                # Parsing the string with cast("timestamp") would go through
                # the session timeZone, making the generated instants
                # ambient-zone-dependent. timestamp_micros yields a
                # session-rendered TIMESTAMP; utc_wall normalizes it to the
                # engine's NTZ-UTC time contract (zone-free: instant → UTC
                # fields), matching every load_table column type.
                F.lit(1_704_067_200_000_000)
                + F.col("id") * F.lit(60_000_000).cast("bigint")
            )
        ).alias("created_at"),
    )


def synthetic_transactions_oracle(n: int = 1000) -> str:
    """DuckDB twin of :func:`synthetic_transactions` (same arithmetic)."""
    cur = ", ".join(f"'{c}'" for c in CURRENCIES)
    cit = ", ".join(f"'{c}'" for c in CITIES)
    return f"""
SELECT
  i                                   AS txn_seq,
  md5(CAST(i AS VARCHAR))             AS txn_id,
  CAST((i * 9973) % 100000 AS DOUBLE) / 100.0 AS amount,
  ([{cur}])[CAST(i % {len(CURRENCIES)} AS INT) + 1] AS currency,
  ([{cit}])[CAST(i % {len(CITIES)} AS INT) + 1]     AS city,
  TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 1 MINUTE AS created_at
FROM range(0, {n}) t(i)
"""
