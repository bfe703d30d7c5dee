"""Physical layout operators: Z-order clustering for data skipping
(SURVEY.md §4.3 — "online store ... Z-order by (entity_type, entity_id) for
point-get locality"; the Delta OPTIMIZE ZORDER analog on plain parquet).

Parquet readers skip row groups whose column min/max can't satisfy a
predicate.  Sorting by one column gives perfect skipping on that column and
none on others; interleaving the bits of several columns' *ranks* (a Morton
/ Z-curve) clusters rows so that ranges of EVERY interleaved column map to
few row groups — multi-column point-gets and range scans prune most of the
file without any index structure.

Plan shape: rank each dim with a window(percent_rank) → quantize to
``bits`` levels → interleave bits JVM-side → repartitionByRange + local
sort on the z-value → write.  One range shuffle; codegen end to end.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _interleave(cols: list[Column], bits: int) -> Column:
    """Morton code: bit i of dim d lands at position i*ndims+d."""
    z = F.lit(0).cast("long")
    for b in range(bits):
        for d, c in enumerate(cols):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * len(cols) + d))
    return z


def zorder_value(df: DataFrame, cols: Sequence[str], bits: int = 8) -> DataFrame:
    """Append a ``__z`` Morton-code column over the ranked dims.

    Ranks (not raw values) make the curve distribution-agnostic — skewed
    or categorical dims quantize evenly.  ``bits`` levels per dim; 8 bits ×
    up to 8 dims fits the 64-bit z-value.
    """
    levels = (1 << bits) - 1
    ranked = []
    out = df
    for i, c in enumerate(cols):
        w = Window.orderBy(F.col(c))
        out = out.withColumn(
            f"__r{i}", (F.percent_rank().over(w) * levels).cast("long")
        )
        ranked.append(F.col(f"__r{i}"))
    out = out.withColumn("__z", _interleave(ranked, bits))
    return out.drop(*[f"__r{i}" for i in range(len(cols))])


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 8,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` Z-ordered on ``cols``: range-partition by the z-value
    (each output file owns a contiguous curve segment) and sort within
    partitions, so every file's min/max on EACH dim covers a small slab.

    Note: ``percent_rank`` needs a global ordering pass per dim — at 100 TB
    use approx quantile cut points instead (same curve, sampled bounds);
    the write path is unchanged.
    """
    z = zorder_value(df, cols, bits=bits)
    (
        z.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
