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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table; normalizes events.ts to timestamp_ntz(µs)."""
    configure(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name != "events":
        return spark.read.parquet(path)
    try:
        df = spark.read.schema(_EVENTS_SCHEMA).parquet(path)
        # nanos → micros truncation (ts >= 0 so `div` == floor), naive UTC to
        # match the file's isAdjustedToUTC=false semantics.
        return df.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    except Exception:
        return _events_from_arrow(spark, path)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}
