"""Sources: parquet loaders for the driver's synthetic tables."""

from feature_store_healthcare_spark.sources.tables import (
    TABLE_NAMES,
    load_table,
    load_tables,
)

__all__ = ["TABLE_NAMES", "load_table", "load_tables"]
