"""Generic sources/sinks beyond the driver's parquet testdata (SURVEY.md
§2.1 — the reference's `FeatureSource.source_type="batch"` never specifies a
format, feature_registry.py:97-114; a drop-in engine must read whatever the
batch location holds).

Thin, explicit wrappers over DataFrameReader/Writer so callers get one
audited path for format choice, schema enforcement, and layout:

- parquet/orc: columnar, splittable, statistics — the only formats suitable
  as system-of-record at 100 TB.
- csv/json: ingest-edge formats.  A schema is REQUIRED at scale (schema
  inference reads the data twice and samples nondeterministically); we allow
  inference only when ``schema=None`` is passed explicitly at test scale.
- Writes support ``partition_by`` (partition pruning on date/type columns).
  For bucketed co-located joins use :func:`..stores.write_bucketed`.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from feature_store_healthcare_spark.session import configure

_FORMATS = ("parquet", "orc", "csv", "json")


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Read a batch source.  csv defaults to header=true; pass a schema for
    anything that will run at scale (inference = double read)."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    configure(spark)
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true")
        if schema is None:
            reader = reader.option("inferSchema", "true")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.options(**options).load(path)


def write_sink(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
    **options: str,
) -> None:
    """Write a batch sink; ``partition_by`` produces the directory layout
    partition pruning reads (SCALE: partition offline stores by
    entity_type/event_date, SURVEY.md §4.3)."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    writer = df.write.format(fmt).mode(mode).options(**options)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
