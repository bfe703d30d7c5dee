"""File-level data skipping on plain parquet: a manifest of per-file
column min/max stats + a manifest-pruned reader (the Iceberg/Delta
data-skipping idea without a table format; SURVEY.md §4.3's "prune most of
the file without any index structure" taken from row-group level to file
level).

Partition pruning skips directories; parquet row-group stats skip pages
*after* a task has been scheduled per file.  At 100 TB the win in between
is not scheduling the task at all: a tiny manifest table (one row per
file) lets the driver drop whole files from the scan before Spark plans
it.  This is exactly what table formats store in metadata; here it is
derived once from the data and persisted next to it.

Build cost: one full scan (distributed, one aggregate per file via
``input_file_name()``).  Read cost: the manifest is a few KB per thousand
files — filtered driver-side (it IS the small side by construction), then
the surviving file list feeds ``spark.read.parquet(*files)``.  Pruning is
conservative: a file is kept unless its [min,max] range provably excludes
the predicate, and columns missing from the manifest never prune.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_manifest(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """Per-file min/max/null-count/row-count stats for ``cols`` over every
    parquet file under ``path`` — one distributed scan, grouped by
    ``input_file_name()``."""
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"min__{c}"),
            F.max(c).alias(f"max__{c}"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"nulls__{c}"),
        ]
    return (
        df.withColumn("file", F.input_file_name())
        .groupBy("file")
        .agg(*aggs)
    )


def write_manifest(manifest: DataFrame, manifest_path: str) -> None:
    """Persist the manifest (single small file — it is one row per data
    file)."""
    manifest.coalesce(1).write.mode("overwrite").parquet(manifest_path)


def prune_files(
    manifest: DataFrame,
    col: str,
    lower=None,
    upper=None,
) -> list[str]:
    """Files whose [min,max] range for ``col`` may satisfy
    ``lower <= col <= upper`` (either bound optional).  Conservative: a
    file with any nulls in ``col`` is kept only for range overlap — null
    semantics never match a range predicate, so nulls can't be lost by
    pruning a file whose non-null range misses.  Driver-side collect of
    the manifest is by design: one row per file."""
    cond = F.lit(True)
    if lower is not None:
        cond = cond & (F.col(f"max__{col}") >= F.lit(lower))
    if upper is not None:
        cond = cond & (F.col(f"min__{col}") <= F.lit(upper))
    # a file of ALL nulls has null min/max -> cond is null -> must keep
    # only if a null could match; range predicates never match null, drop.
    keep = manifest.where(cond).select("file").collect()
    return [r["file"] for r in keep]


def pruned_read(
    spark: SparkSession,
    manifest: DataFrame,
    col: str,
    lower=None,
    upper=None,
) -> DataFrame:
    """Read only the files the manifest can't exclude for the range
    predicate, then re-apply the predicate exactly (pruning is a superset
    filter, correctness never depends on it).  Returns an empty frame with
    the manifest'd schema when every file prunes."""
    files = prune_files(manifest, col, lower, upper)
    if not files:
        any_file = [r["file"] for r in manifest.select("file").limit(1).collect()]
        df = spark.read.parquet(*any_file)
        return df.where(F.lit(False))
    df = spark.read.parquet(*files)
    if lower is not None:
        df = df.where(F.col(col) >= F.lit(lower))
    if upper is not None:
        df = df.where(F.col(col) <= F.lit(upper))
    return df
