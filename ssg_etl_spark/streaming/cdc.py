"""CDC envelope parsing and topic routing (SURVEY §2.1 S10, §2.9 M12/M13).

The reference's Kafka consumer subscribes to topic-per-table streams
(``sqlserver.silverstr.sales_master|sales_items``), JSON-deserializes each
message, and routes by topic to the matching insert
(scripts/test/transform.py:46-83). Its trigger-based CDC captures old/new
row images into a JSONB object (scripts/test/scripts.sql:25-49, Debezium
prep with REPLICA IDENTITY FULL).

Spark-native form: messages are (topic, value) rows — from
``spark.readStream.format("kafka")`` in production, from any DataFrame in
tests (the functions are stream/batch agnostic, which is what makes them
testable without a broker). ``from_json`` with the per-topic schema does
the deserialization JVM-side; routing is a filter per topic (one shared
scan; Catalyst collapses the filters into the source).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def route_topics(
    messages: DataFrame, topic_schemas: dict[str, T.StructType]
) -> dict[str, DataFrame]:
    """M13: topic-per-table routing + typed deserialization.

    ``messages`` has (topic string, value string) — the Kafka wire shape.
    Returns one typed DataFrame per topic, ready for ``foreach_batch_upsert``
    (streaming/pipeline.py) or a plain append.
    """
    out: dict[str, DataFrame] = {}
    for topic, schema in topic_schemas.items():
        out[topic] = (
            messages.filter(F.col("topic") == topic)
            .select(F.from_json(F.col("value"), schema).alias("rec"))
            .select("rec.*")
        )
    return out


# The trigger's JSONB envelope (scripts/test/scripts.sql:29-45):
# {"operation": "UPDATE", "old": {...}, "new": {...}}
def change_envelope_schema(row_schema: T.StructType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("operation", T.StringType()),
            T.StructField("old", row_schema),
            T.StructField("new", row_schema),
        ]
    )


def parse_change_envelopes(
    envelopes: DataFrame, row_schema: T.StructType, value_col: str = "value"
) -> DataFrame:
    """M12: parse trigger/Debezium-style old/new change events.

    Emits (…passthrough, operation, old struct, new struct, changed_fields
    array) — non-value input columns (a Kafka offset / CDC LSN, topic,
    partition) pass through untouched so they can sequence the apply step.
    The changed-fields diff is computed JVM-side by comparing old/new field
    pairs with the null-safe equality the reference's trigger uses
    (``IS DISTINCT FROM``, scripts.sql:37).
    """
    extra = [c for c in envelopes.columns if c != value_col]
    parsed = envelopes.select(
        *extra,
        F.from_json(F.col(value_col), change_envelope_schema(row_schema)).alias("e"),
    ).select(*extra, "e.operation", "e.old", "e.new")

    def changed(field: str) -> Column:
        # null-safe inequality: NOT (old <=> new)
        return F.when(
            ~F.col(f"old.{field}").eqNullSafe(F.col(f"new.{field}")), F.lit(field)
        )

    fields = [f.name for f in row_schema.fields]
    return parsed.withColumn(
        "changed_fields",
        F.array_compact(F.array(*[changed(f) for f in fields])),
    )


def apply_cdc_batch(
    target: DataFrame,
    changes: DataFrame,
    keys: list[str],
    seq_col: str | None = None,
) -> DataFrame:
    """Apply parsed change events to a target snapshot (join-rewrite, no
    in-place update).

    The batch is first reduced to ONE change per key — the one that decides
    the key's final state: with ``seq_col`` (CDC LSN / offset) the
    highest-sequence change wins, so update-then-delete deletes and
    delete-then-reinsert reinserts. Without ``seq_col`` an arbitrary change
    per key is kept; pass it whenever batches may hold multiple changes for
    one key. DELETE winners drop the key; other winners upsert their new
    image.
    """
    from pyspark.sql.window import Window

    from ssg_etl_spark.operators.merge import merge_upsert

    # Malformed envelopes (operation missing/unknown) are excluded entirely —
    # otherwise a NULL operation would fail the != 'DELETE' filter (3VL) and
    # turn the row into an unintended delete.
    changes = changes.filter(F.col("operation").isin("INSERT", "UPDATE", "DELETE"))

    key_of = [
        F.coalesce(F.col(f"new.{k}"), F.col(f"old.{k}")).alias(f"_k_{k}")
        for k in keys
    ]
    seq = F.col(seq_col) if seq_col is not None else F.lit(0)
    w = Window.partitionBy(*[f"_k_{k}" for k in keys]).orderBy(F.desc("_seq"))
    latest = (
        changes.select("*", *key_of, seq.alias("_seq"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )

    # Retire every OLD image key referenced ANYWHERE in the batch (not just
    # by winners): a key-changing UPDATE retires its old key even when a
    # later change wins its new key's partition. Keys that end alive are
    # re-inserted by the winners' new images below.
    removed = (
        changes.filter(F.col("old").isNotNull())
        .select(*[F.col(f"old.{k}").alias(k) for k in keys])
        .distinct()
    )
    # A winner is superseded if a STRICTLY LATER key-changing event moved
    # its key away: INSERT(k=A, seq1) + UPDATE(old A → new B, seq2) must end
    # with only B — the INSERT wins partition A (the move competes under B),
    # but its image predates A's retirement, so it must not be re-upserted.
    # Ties (same LSN, e.g. one transaction; or no seq_col at all, where every
    # _seq is 0) are NOT suppressed: without a strict order we keep the
    # per-final-key winner rather than silently dropping data.
    key_differs = [~F.col(f"old.{k}").eqNullSafe(F.col(f"new.{k}")) for k in keys]
    moved_away = (
        changes.filter(F.col("old").isNotNull() & F.col("new").isNotNull())
        .filter(F.array_contains(F.array(*key_differs), F.lit(True)))
        .groupBy(*[F.col(f"old.{k}").alias(f"_k_{k}") for k in keys])
        .agg(F.max(seq).alias("_moved_seq"))
    )
    upserts = (
        latest.filter(F.col("operation") != "DELETE")
        .join(moved_away, [f"_k_{k}" for k in keys], "left")
        .filter(F.col("_moved_seq").isNull() | (F.col("_seq") >= F.col("_moved_seq")))
        .select("new.*")
    )
    survived = target.join(removed, keys, "left_anti")
    return merge_upsert(survived, upserts, keys)
