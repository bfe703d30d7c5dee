"""Sources: parquet loaders for the driver's synthetic tables, plus generic
format readers/writers (parquet/orc/csv/json)."""

from feature_store_healthcare_spark.sources.io import read_source, write_sink
from feature_store_healthcare_spark.sources.tables import (
    TABLE_NAMES,
    load_table,
    load_tables,
    register_views,
)

__all__ = ["TABLE_NAMES", "load_table", "load_tables", "read_source", "register_views", "write_sink"]
