"""Sources & sinks (SURVEY §2.1 S1-S14, Spark-first)."""

from ssg_etl_spark.sources.tables import load_table, load_tables, register_views

__all__ = ["load_table", "load_tables", "register_views"]
