"""Scalar / column function library (SURVEY §2.8 F1-F12)."""

from ssg_etl_spark.functions.scalar import (
    case_map,
    coalesce_zero,
    null_profile_exprs,
    safe_ratio,
)

__all__ = ["case_map", "coalesce_zero", "null_profile_exprs", "safe_ratio"]
