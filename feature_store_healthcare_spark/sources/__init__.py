"""Sources: parquet loaders for the driver's synthetic tables, generic
format readers/writers (parquet/orc/csv/json), and manifest-based file
skipping."""

from feature_store_healthcare_spark.sources.io import read_source, write_sink
from feature_store_healthcare_spark.sources.manifest import (
    build_manifest,
    prune_files,
    pruned_read,
    write_manifest,
)
from feature_store_healthcare_spark.sources.tables import (
    TABLE_NAMES,
    load_table,
    load_tables,
    register_views,
)

__all__ = [
    "TABLE_NAMES", "build_manifest", "load_table", "load_tables",
    "prune_files", "pruned_read", "read_source", "register_views",
    "write_manifest", "write_sink",
]
