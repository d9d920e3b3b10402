"""Property-based invariants (hypothesis) for the merge/dedup algebra."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ssg_etl_spark.operators import merge as M

KEYS = st.integers(min_value=0, max_value=9)
VALS = st.one_of(st.none(), st.text(alphabet="abc", max_size=2))
ROWS = st.dictionaries(KEYS, VALS, max_size=8)  # key -> value, unique keys

_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, d):
    return spark.createDataFrame(
        [(k, v) for k, v in sorted(d.items())] or [], "k int, v string"
    )


@given(target=ROWS, source=ROWS)
@_SETTINGS
def test_merge_upsert_is_dict_union(spark, target, source):
    """merge(target, source) == {**target, **source} (source wins per key)."""
    out = {
        r.k: r.v
        for r in M.merge_upsert(_df(spark, target), _df(spark, source), ["k"]).collect()
    }
    assert out == {**target, **source}


@given(target=ROWS, source=ROWS)
@_SETTINGS
def test_detect_changes_partition(spark, target, source):
    """Change classes partition the source: insert ∪ update ∪ unchanged."""
    rows = M.detect_changes(_df(spark, target), _df(spark, source), ["k"]).collect()
    inserts = {r.k for r in rows if r.change_type == "insert"}
    updates = {r.k for r in rows if r.change_type == "update"}
    assert inserts == {k for k in source if k not in target}
    assert updates == {k for k in source if k in target and target[k] != source[k]}
    assert not inserts & updates
