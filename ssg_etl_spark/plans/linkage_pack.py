"""Record-linkage pack: blocked fuzzy entity matching over a
deterministically perturbed customer mirror (the master-data dedup /
CRM-reconciliation shape). BASELINE.json north-star extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ssg_etl_spark.operators import linkage
from ssg_etl_spark.plans.registry import register
from ssg_etl_spark.sources.tables import load_table

# Deterministic "dirty mirror" of customer names: a third get one char
# substituted, a third get one char deleted, a third pass through —
# the classic typo profile a linkage step reconciles. Same expression
# string runs in Spark SQL and DuckDB.
_PERTURB = """
CASE WHEN c_custkey % 3 = 0
       THEN substr(c_name, 1, 9) || 'X' || substr(c_name, 11)
     WHEN c_custkey % 3 = 1
       THEN substr(c_name, 1, 11) || substr(c_name, 13)
     ELSE c_name END
"""


@register(
    "fuzzy_customer_match",
    oracle=f"""
WITH crm AS (
  SELECT c_custkey + 1000000 AS crm_id,
    {_PERTURB} AS crm_name,
    c_nationkey
  FROM customer),
l AS (SELECT c_custkey, c_name, c_nationkey,
        right(c_name, 3) AS sfx FROM customer),
r AS (SELECT crm_id, crm_name, c_nationkey,
        right(crm_name, 3) AS sfx FROM crm),
cand AS (
  SELECT l.c_custkey, r.crm_id,
    levenshtein(l.c_name, r.crm_name) AS edit_dist
  FROM l JOIN r ON l.c_nationkey = r.c_nationkey AND l.sfx = r.sfx
  WHERE levenshtein(l.c_name, r.crm_name) <= 2)
SELECT c_custkey, crm_id, edit_dist
FROM cand
QUALIFY row_number() OVER (
  PARTITION BY c_custkey ORDER BY edit_dist, crm_id) = 1
""",
    tags=("linkage", "dedup", "llm"),
    extra=True,
)
def fuzzy_customer_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy record linkage: customers vs a typo-perturbed CRM
    mirror, blocked on (nation, name-suffix) so the only join is an
    equi-join on the blocking key (with the oversized-block guard), edit
    distance ≤ 2 on candidates only (JVM levenshtein with the threshold
    short-circuit), then min-struct resolution to one best match per
    customer."""
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    crm = customer.select(
        (F.col("c_custkey") + 1000000).alias("crm_id"),
        F.expr(_PERTURB).alias("crm_name"),
        "c_nationkey",
    )
    left = customer.withColumn("sfx", F.expr("right(c_name, 3)"))
    right = crm.withColumn("sfx", F.expr("right(crm_name, 3)"))
    matches = linkage.fuzzy_match(
        left,
        right,
        block_cols=["c_nationkey", "sfx"],
        text_l="c_name",
        text_r="crm_name",
        max_dist=2,
    )
    return linkage.best_match_per_left(matches, "c_custkey", "crm_id")
