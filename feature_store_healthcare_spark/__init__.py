"""feature_store_healthcare_spark — a PySpark-native feature-store engine.

A ground-up re-expression of the capabilities of the reference repo
``cmangun/feature-store-healthcare`` (a pure-Python, in-memory healthcare ML
feature store) as an idiomatic Apache Spark engine:

- the registry of typed, versioned, PHI-classified feature definitions
  (reference: src/registry/feature_registry.py) becomes a metadata catalog
  backed by Spark DataFrames for broadcast joins;
- the bitemporal EAV value store (feature_registry.py:181-198) becomes an
  append-only, partitioned long-format table;
- the online/offline serving split (src/serving/feature_server.py:203-204)
  becomes a MERGE-maintained latest table plus an append-only history table;
- every "query" the reference runs as a Python loop becomes a declarative
  DataFrame plan that Catalyst optimizes (predicate pushdown, column pruning,
  broadcast joins, whole-stage codegen).

Nothing is copied from the reference; file:line citations in docstrings map
behavior to the reference implementation for parity checking only.
"""

from feature_store_healthcare_spark.registry import (
    Feature,
    FeatureCategory,
    FeatureGroup,
    FeatureRegistry,
    FeatureSchema,
    FeatureSource,
    FeatureStatus,
    FeatureValueType,
    PHILevel,
)
from feature_store_healthcare_spark.serving import (
    FeatureFreshness,
    FeatureServer,
    ServingConfig,
    ServingMode,
)

__all__ = [
    "Feature",
    "FeatureCategory",
    "FeatureGroup",
    "FeatureRegistry",
    "FeatureSchema",
    "FeatureSource",
    "FeatureStatus",
    "FeatureValueType",
    "PHILevel",
    "FeatureFreshness",
    "FeatureServer",
    "ServingConfig",
    "ServingMode",
]

__version__ = "0.1.0"
