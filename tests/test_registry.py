"""Public-registry contract: the driver evaluates at most the first 50
entries, so the public surface must stay at/below the cap, ordered with the
flagship packs first, and every public query must carry a DuckDB oracle
(the two former hash-defined exceptions gained oracles in round 3 — the
SimHash pipeline via an md5-derived signature hash, the LSH ANN pipeline
via list-lambda replay)."""

from __future__ import annotations

from ssg_etl_spark.plans.registry import MAX_PUBLIC_QUERIES, load_all


def test_public_registry_contract():
    public = load_all()
    assert len(public) <= MAX_PUBLIC_QUERIES
    # Flagship relational queries lead the evaluation order.
    names = list(public)
    assert names[0] == "gl_enrichment"
    # Every public query is hash-checkable against its oracle.
    no_oracle = {n for n, s in public.items() if not s.oracle}
    assert no_oracle == set()


def test_extra_registry_is_disjoint_and_oracled():
    public = set(load_all())
    both = load_all(include_extra=True)
    extra = {n: s for n, s in both.items() if n not in public}
    assert public <= set(both)
    # Every demoted near-duplicate keeps its oracle (still locally checked).
    assert all(s.oracle for s in extra.values()), [
        n for n, s in extra.items() if not s.oracle
    ]


def test_no_handwritten_rotation_status_in_docstrings():
    """The _REGISTRY/_EXTRA split is the single source of truth for which
    queries the driver sees; hand-written status claims in docstrings lag
    rotations (24 were stale after rotation #5), so they are banned."""
    both = load_all(include_extra=True)
    offenders = {
        n
        for n, s in both.items()
        if "Public registry" in s.doc
        or "Extra registry" in s.doc
        or "driver-checked" in s.doc
    }
    assert offenders == set(), sorted(offenders)
