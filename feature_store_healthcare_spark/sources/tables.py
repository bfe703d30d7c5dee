"""Parquet sources for the driver testdata (SURVEY.md §2 OP-8).

``/root/testdata/sf*/`` holds a TPC-H-ish star schema plus ``events``
(stream-shaped), ``documents`` (text corpus) and ``embeddings``
(``array<float>`` dim=64).  All loads are plain ``spark.read.parquet`` so
Catalyst gets predicate pushdown / column pruning for free; the one special
case is ``events`` whose ``ts`` column is parquet ``TIMESTAMP(NANOS,false)``
— Spark has no nanos type, so we read it as long
(``spark.sql.legacy.parquet.nanosAsLong``) and truncate to microseconds as
``timestamp_ntz``, matching what DuckDB reports for the same file.

Scale note: at 100 TB these reads become partitioned-table scans; nothing in
this module iterates rows or collects to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from feature_store_healthcare_spark.session import configure

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # nanos-as-long
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _events_from_arrow(spark: SparkSession, path: str) -> DataFrame:
    """Fallback path if the nanos-as-long conf is unavailable: convert via
    pyarrow on the driver.  Only viable for test scale factors; the primary
    path is the native reader."""
    import pyarrow.parquet as pq

    table = pq.read_table(path)
    pdf = table.to_pandas()
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    return spark.createDataFrame(pdf)


#: single-file tables below this size get a post-scan repartition (see
#: _spread); above it, the file count / row-group count provides scan
#: parallelism on its own.
_SPREAD_MAX_BYTES = 256 * 1024 * 1024

#: only tables whose downstream operators are expensive PER ROW (regex
#: scoring, shingle explode, minhash, 64-dim array math) benefit from the
#: extra exchange; cheap-per-row relational tables lose more to the added
#: stage than they gain in parallelism.
_SPREAD_TABLES = {"documents", "embeddings"}


def _spread(df: DataFrame, spark: SparkSession, path: str, name: str) -> DataFrame:
    """Parallelize small single-row-group files for compute-heavy tables.

    The testdata parquet files each have ONE row group, so Spark's scan is a
    single task and every downstream expression (shingle explode, regex
    scoring, minhash) runs on one core until the first shuffle.  A cheap
    round-robin repartition right after the scan spreads the work across the
    cluster; filters and column pruning still push through the exchange down
    to the scan.  Guarded by file size so genuinely large inputs (many
    files / many row groups — the 100 TB case) are left to the scanner's own
    split planning.
    """
    if name not in _SPREAD_TABLES:
        return df
    try:
        if os.path.getsize(path) >= _SPREAD_MAX_BYTES:
            return df
    except OSError:
        return df
    return df.repartition(spark.sparkContext.defaultParallelism)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table; normalizes events.ts to timestamp_ntz(µs)."""
    configure(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name != "events":
        return _spread(spark.read.parquet(path), spark, path, name)
    try:
        df = spark.read.schema(_EVENTS_SCHEMA).parquet(path)
        # nanos → micros truncation (ts >= 0 so `div` == floor), naive UTC to
        # match the file's isAdjustedToUTC=false semantics.
        df = df.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
        return _spread(df, spark, path, name)
    except Exception:
        return _events_from_arrow(spark, path)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> None:
    """Register every testdata table as a temp view so users can run raw
    ``spark.sql`` against the catalog (the SQL front door the reference
    never had — its "queries" were Python methods).  Views are lazy; the
    nanos-ts normalization and small-file spreading of :func:`load_table`
    apply to every SQL reader for free."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
