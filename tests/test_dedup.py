"""Dedup operators: planted near-duplicates recovered, approximations
bounded by the exact baseline."""

from __future__ import annotations

from ssg_etl_spark.operators import dedup
from ssg_etl_spark.sources.tables import load_table


def _pairs(df):
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_minhash_equals_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    exact = _pairs(dedup.ngram_jaccard_pairs(docs, 0.5))
    approx = _pairs(dedup.minhash_lsh_pairs(docs, 0.5))
    assert approx == exact  # verification removes FPs; LSH recall ~1 here


def test_simhash_no_false_positives_and_decent_recall(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    exact = _pairs(dedup.ngram_jaccard_pairs(docs, 0.5))
    sim = _pairs(dedup.simhash_pairs(docs))
    if exact:
        assert len(sim & exact) / len(exact) >= 0.5  # approximate method
    assert not (sim - exact), "simhash found pairs the exact method rejects"


def test_exact_dedup_counts(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    groups = dedup.exact_dedup_groups(docs)
    total = groups.agg({"n_duplicates": "sum"}).first()[0]
    assert total == docs.count()  # partition of the corpus
