"""CDC routing/envelope parsing/apply + retry wrapper (S10, M12, M13, §2.12)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from ssg_etl_spark.functions.retry import with_retry
from ssg_etl_spark.streaming import cdc

ROW = T.StructType(
    [
        T.StructField("k", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("amount", T.DoubleType()),
    ]
)


def test_route_topics(spark):
    msgs = spark.createDataFrame(
        [
            ("t.sales_master", '{"k": 1, "name": "a", "amount": 10.0}'),
            ("t.sales_items", '{"k": 7, "name": "x", "amount": 1.5}'),
            ("t.sales_master", '{"k": 2, "name": "b", "amount": 20.0}'),
        ],
        "topic string, value string",
    )
    routed = cdc.route_topics(msgs, {"t.sales_master": ROW, "t.sales_items": ROW})
    assert sorted(r.k for r in routed["t.sales_master"].collect()) == [1, 2]
    assert [r.k for r in routed["t.sales_items"].collect()] == [7]


def test_parse_change_envelopes_diff_fields(spark):
    env = spark.createDataFrame(
        [
            (
                '{"operation": "UPDATE",'
                ' "old": {"k": 1, "name": "a", "amount": 10.0},'
                ' "new": {"k": 1, "name": "a", "amount": 99.0}}',
            ),
            (
                '{"operation": "UPDATE",'
                ' "old": {"k": 2, "name": null, "amount": 5.0},'
                ' "new": {"k": 2, "name": "b", "amount": 5.0}}',
            ),
        ],
        "value string",
    )
    out = {r.old.k: r.changed_fields for r in cdc.parse_change_envelopes(env, ROW).collect()}
    assert out == {1: ["amount"], 2: ["name"]}  # null-safe diff


def test_apply_cdc_batch(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ROW
    )
    env = spark.createDataFrame(
        [
            ('{"operation": "DELETE", "old": {"k": 3, "name": "c", "amount": 30.0}, "new": null}',),
            ('{"operation": "UPDATE", "old": {"k": 2, "name": "b", "amount": 20.0},'
             ' "new": {"k": 2, "name": "b2", "amount": 21.0}}',),
            ('{"operation": "INSERT", "old": null, "new": {"k": 4, "name": "d", "amount": 40.0}}',),
        ],
        "value string",
    )
    changes = cdc.parse_change_envelopes(env, ROW)
    out = {r.k: (r.name, r.amount) for r in cdc.apply_cdc_batch(target, changes, ["k"]).collect()}
    assert out == {1: ("a", 10.0), 2: ("b2", 21.0), 4: ("d", 40.0)}


def test_retry_transient_then_success():
    calls = {"n": 0}
    sleeps: list[float] = []

    @with_retry(retries=3, base_delay=1.0, sleep=sleeps.append)
    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("connection reset by peer")
        return "ok"

    assert flaky() == "ok"
    assert sleeps == [1.0, 2.0]  # exponential backoff


def test_retry_permanent_fails_fast():
    calls = {"n": 0}

    @with_retry(retries=5, base_delay=0.0, sleep=lambda _: None)
    def bad_sql():
        calls["n"] += 1
        raise ValueError("syntax error near SELECT")

    with pytest.raises(ValueError):
        bad_sql()
    assert calls["n"] == 1  # not retried: permanent error triage


def test_apply_cdc_batch_multi_change_per_key_with_seq(spark):
    target = spark.createDataFrame([(1, "a", 10.0)], ROW)
    env = spark.createDataFrame(
        [
            ('{"operation": "UPDATE", "old": {"k": 1, "name": "a", "amount": 10.0},'
             ' "new": {"k": 1, "name": "a1", "amount": 11.0}}', 1),
            ('{"operation": "DELETE", "old": {"k": 1, "name": "a1", "amount": 11.0},'
             ' "new": null}', 2),
            ('{"operation": "INSERT", "old": null,'
             ' "new": {"k": 5, "name": "e", "amount": 50.0}}', 1),
            ('{"operation": "UPDATE", "old": {"k": 5, "name": "e", "amount": 50.0},'
             ' "new": {"k": 5, "name": "e2", "amount": 51.0}}', 2),
        ],
        "value string, seq int",
    )
    changes = cdc.parse_change_envelopes(env, ROW)  # seq passes through
    out = {
        r.k: (r.name, r.amount)
        for r in cdc.apply_cdc_batch(target, changes, ["k"], seq_col="seq").collect()
    }
    # k=1: update then delete -> gone; k=5: insert then update -> latest image.
    assert out == {5: ("e2", 51.0)}


def test_apply_cdc_batch_key_change_retires_old_key(spark):
    """A key-changing UPDATE retires its old key even when a later change
    wins the new key's partition."""
    target = spark.createDataFrame([(1, "a", 10.0), (9, "z", 90.0)], ROW)
    env = spark.createDataFrame(
        [
            ('{"operation": "UPDATE", "old": {"k": 1, "name": "a", "amount": 10.0},'
             ' "new": {"k": 2, "name": "a", "amount": 10.0}}', 1),
            ('{"operation": "UPDATE", "old": {"k": 2, "name": "a", "amount": 10.0},'
             ' "new": {"k": 2, "name": "a2", "amount": 12.0}}', 2),
        ],
        "value string, seq int",
    )
    changes = cdc.parse_change_envelopes(env, ROW)
    out = {
        r.k: (r.name, r.amount)
        for r in cdc.apply_cdc_batch(target, changes, ["k"], seq_col="seq").collect()
    }
    assert out == {2: ("a2", 12.0), 9: ("z", 90.0)}  # k=1 retired, not stale


def test_apply_cdc_batch_key_move_supersedes_earlier_winner(spark):
    """INSERT(k=A, seq1) then key-change UPDATE(A→B, seq2): the INSERT wins
    partition A (the move competes under B) but predates A's retirement —
    final state must contain only B."""
    target = spark.createDataFrame([(9, "z", 90.0)], ROW)
    env = spark.createDataFrame(
        [
            ('{"operation": "INSERT", "old": null,'
             ' "new": {"k": 1, "name": "a", "amount": 10.0}}', 1),
            ('{"operation": "UPDATE", "old": {"k": 1, "name": "a", "amount": 10.0},'
             ' "new": {"k": 2, "name": "a", "amount": 10.0}}', 2),
        ],
        "value string, seq int",
    )
    changes = cdc.parse_change_envelopes(env, ROW)
    out = {
        r.k: (r.name, r.amount)
        for r in cdc.apply_cdc_batch(target, changes, ["k"], seq_col="seq").collect()
    }
    assert out == {2: ("a", 10.0), 9: ("z", 90.0)}  # k=1 NOT resurrected


def test_apply_cdc_batch_key_reborn_after_move_survives(spark):
    """A key re-established AFTER its move-away must survive:
    UPDATE(A→B, seq1) then INSERT(k=A, seq2) ends with both A and B."""
    target = spark.createDataFrame([(1, "a", 10.0)], ROW)
    env = spark.createDataFrame(
        [
            ('{"operation": "UPDATE", "old": {"k": 1, "name": "a", "amount": 10.0},'
             ' "new": {"k": 2, "name": "a", "amount": 10.0}}', 1),
            ('{"operation": "INSERT", "old": null,'
             ' "new": {"k": 1, "name": "a-new", "amount": 11.0}}', 2),
        ],
        "value string, seq int",
    )
    changes = cdc.parse_change_envelopes(env, ROW)
    out = {
        r.k: (r.name, r.amount)
        for r in cdc.apply_cdc_batch(target, changes, ["k"], seq_col="seq").collect()
    }
    assert out == {1: ("a-new", 11.0), 2: ("a", 10.0)}


def test_apply_cdc_batch_same_seq_move_and_rebirth_keeps_row(spark):
    """One transaction can emit a key-move and a rebirth with the SAME LSN;
    without a strict order the reborn row must be kept, not dropped."""
    target = spark.createDataFrame([(1, "a", 10.0)], ROW)
    env = spark.createDataFrame(
        [
            ('{"operation": "UPDATE", "old": {"k": 1, "name": "a", "amount": 10.0},'
             ' "new": {"k": 2, "name": "a", "amount": 10.0}}', 5),
            ('{"operation": "INSERT", "old": null,'
             ' "new": {"k": 1, "name": "a-re", "amount": 11.0}}', 5),
        ],
        "value string, seq int",
    )
    changes = cdc.parse_change_envelopes(env, ROW)
    out = {
        r.k: r.name
        for r in cdc.apply_cdc_batch(target, changes, ["k"], seq_col="seq").collect()
    }
    assert out == {1: "a-re", 2: "a"}


def test_apply_cdc_batch_malformed_operation_is_ignored(spark):
    target = spark.createDataFrame([(1, "a", 10.0)], ROW)
    env = spark.createDataFrame(
        [('{"old": {"k": 1, "name": "a", "amount": 10.0},'
          ' "new": {"k": 1, "name": "mangled", "amount": 0.0}}',)],
        "value string",
    )
    changes = cdc.parse_change_envelopes(env, ROW)
    out = {r.k: r.name for r in cdc.apply_cdc_batch(target, changes, ["k"]).collect()}
    assert out == {1: "a"}  # neither deleted nor mangled
