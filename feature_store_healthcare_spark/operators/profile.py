"""ANALYZE-style column profiling (★ driver-extension surface; the
reference keeps no table statistics at all — its only metadata is the
per-feature dataclass, feature_registry.py:169-188).

One aggregation pass over the table computes, per requested column:
row count, non-null count, null count, distinct count, and min/max
(stringified for a uniform long-format output).  The wide single-row
aggregate is then unpivoted driver-free via an ``explode`` of a struct
array — no second scan, no collect.

Scale: exact ``countDistinct`` on k columns makes Catalyst plan an Expand
(k× the input rows before partial aggregation) — the right default for an
oracle-checked profile at test scale.  At 100 TB pass ``exact=False`` for
``approx_count_distinct`` (HLL, no Expand, one combined partial agg) —
same plan otherwise.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(
    df: DataFrame, cols: Sequence[str], exact: bool = True
) -> DataFrame:
    """Long-format per-column stats: (column, n_rows, n_values, n_nulls,
    n_distinct, min_value, max_value)."""
    ndv = F.countDistinct if exact else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nv_{c}"),
            ndv(F.col(c)).alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n_rows").alias("n_rows"),
                F.col(f"__nv_{c}").alias("n_values"),
                (F.col("__n_rows") - F.col(f"__nv_{c}")).alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(rows).alias("__p")).select("__p.*")
