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
from pyspark.sql import functions as F
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


def align_schemas(dfs: Sequence[DataFrame]) -> DataFrame:
    """Union frames whose schemas drifted (columns added/dropped over
    time): ``unionByName(allowMissingColumns=True)`` folds them into the
    superset schema with NULLs where a frame lacks a column — the standard
    read-side answer to append-era schema evolution on plain parquet
    (write-side, parquet readers handle added columns natively via
    ``mergeSchema``).  Column ORDER is by first appearance; types must be
    compatible (Spark resolves by name, errors on true conflicts — which
    is what you want: silent coercion hides corruption)."""
    if not dfs:
        raise ValueError("align_schemas needs at least one frame")
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def read_json_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    corrupt_col: str = "_corrupt_record",
) -> tuple[DataFrame, DataFrame]:
    """Ingest-edge JSON read with malformed-row quarantine: PERMISSIVE mode
    parses what it can and captures unparseable lines in ``corrupt_col``;
    the split returns (good_rows_without_the_column, quarantined_lines).
    The quarantine side keeps the raw line for replay after a fix — the
    file-level twin of the registry's per-value quarantine
    (registry.ingest_values_df).

    Spark requires the corrupt column to be declared in the schema AND the
    parsed frame to be cached before filtering on it (the column is
    populated only while parsing; filtering an uncached lazy plan on it is
    undefined) — both handled here so callers can't hold it wrong.
    """
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if corrupt_col not in [f.name for f in schema.fields]:
        schema = schema.add(T.StructField(corrupt_col, T.StringType()))
    configure(spark)
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    ).cache()
    good = df.where(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.where(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_line")
    )
    return good, bad
