"""Operator library: named, reusable DataFrame→DataFrame transforms.

Each operator maps one row of SURVEY.md §2's inventory to an idiomatic
Spark implementation.  Operators are plain functions (no state); every hot
path stays JVM-side (built-in expressions) unless the semantics genuinely
need Python, in which case Arrow-batched pandas UDFs are used.
"""

from feature_store_healthcare_spark.operators.pit import (
    as_of_filter,
    latest_per_key,
    point_in_time_join,
)

__all__ = ["as_of_filter", "latest_per_key", "point_in_time_join"]
