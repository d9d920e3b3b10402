"""Record-linkage operators: blocked candidates, block-size guard,
threshold edit-distance matching, best-match resolution."""

from __future__ import annotations

from pyspark.sql import functions as F

from ssg_etl_spark.operators import linkage


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "alpha corp", "US"),
            (2, "beta llc", "US"),
            (3, "gamma gmbh", "DE"),
            (4, "delta sa", None),
        ],
        "lid int, lname string, blk string",
    )
    right = spark.createDataFrame(
        [
            (101, "alpha corp.", "US"),
            (102, "betta llc", "US"),
            (103, "gamma gmbh", "DE"),
            (104, "omega ag", "DE"),
            (105, "delta sa", None),
        ],
        "rid int, rname string, blk string",
    )
    return left, right


def test_blocked_candidates_equi_join_and_null_keys(spark):
    left, right = _frames(spark)
    cands = linkage.blocked_candidates(left, right, ["blk"])
    pairs = {(r.lid, r.rid) for r in cands.collect()}
    # US block: 2x2, DE block: 1x2; NULL block keys never match.
    assert pairs == {
        (1, 101),
        (1, 102),
        (2, 101),
        (2, 102),
        (3, 103),
        (3, 104),
    }


def test_oversized_block_dropped(spark):
    # Planted mega-block: one degenerate key with 200x200 candidate
    # pairs against a cap of 1000 — the whole block must vanish while
    # the small block survives.
    left = spark.range(200).select(
        F.col("id").alias("lid"), F.lit("mega").alias("blk")
    )
    left = left.union(
        spark.range(5).select(
            (F.col("id") + 1000).alias("lid"), F.lit("ok").alias("blk")
        )
    )
    right = spark.range(200).select(
        (F.col("id") + 5000).alias("rid"), F.lit("mega").alias("blk")
    )
    right = right.union(
        spark.range(4).select(
            (F.col("id") + 9000).alias("rid"), F.lit("ok").alias("blk")
        )
    )
    cands = linkage.blocked_candidates(
        left, right, ["blk"], max_block_pairs=1000
    )
    rows = cands.groupBy("blk").count().collect()
    assert {r.blk: r["count"] for r in rows} == {"ok": 20}
    # Guard off → the mega block comes back.
    all_cands = linkage.blocked_candidates(
        left, right, ["blk"], max_block_pairs=None
    )
    assert all_cands.count() == 200 * 200 + 20


def test_fuzzy_match_threshold_and_best_match(spark):
    left, right = _frames(spark)
    matches = linkage.fuzzy_match(
        left, right, ["blk"], "lname", "rname", max_dist=2
    )
    got = {(r.lid, r.rid, r.edit_dist) for r in matches.collect()}
    # alpha corp ~ alpha corp. (1), beta llc ~ betta llc (1),
    # gamma gmbh exact (0); cross-pairs and omega exceed 2.
    assert got == {(1, 101, 1), (2, 102, 1), (3, 103, 0)}

    best = linkage.best_match_per_left(matches, "lid", "rid")
    assert {(r.lid, r.rid, r.edit_dist) for r in best.collect()} == got


def test_best_match_tiebreak_min_right_id(spark):
    matches = spark.createDataFrame(
        [(1, 20, 1), (1, 10, 1), (1, 30, 0), (2, 40, 2)],
        "lid int, rid int, edit_dist int",
    )
    best = linkage.best_match_per_left(matches, "lid", "rid")
    assert {(r.lid, r.rid, r.edit_dist) for r in best.collect()} == {
        (1, 30, 0),
        (2, 40, 2),
    }


def test_fuzzy_customer_match_registered_and_runs(spark, sf_dir):
    from ssg_etl_spark.plans.linkage_pack import fuzzy_customer_match

    df = fuzzy_customer_match(spark, sf_dir)
    rows = df.collect()
    assert df.columns == ["c_custkey", "crm_id", "edit_dist"]
    assert len(rows) > 0
    by_key = {r.c_custkey: r for r in rows}
    # Every resolved match is the customer's own perturbed mirror row
    # (ids offset by 1e6) at distance <= 2, one row per customer.
    assert len(by_key) == len(rows)
    assert all(r.crm_id == r.c_custkey + 1000000 for r in rows)
    assert all(0 <= r.edit_dist <= 2 for r in rows)
