"""Query plans: named, oracle-shadowed query definitions."""

from ssg_etl_spark.plans.registry import load_all, oracle_sql, queries, register

__all__ = ["load_all", "oracle_sql", "queries", "register"]
