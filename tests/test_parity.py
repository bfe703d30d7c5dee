"""Reference API parity (round-10 VERDICT #8): every PUBLIC symbol of the
reference's two modules (src/registry/feature_registry.py,
src/serving/feature_server.py) has a named engine analog, and the parity
enums carry the reference's exact value sets.

This is a code-level drop-in check — behavioral parity is the oracle
gate's job; here we pin that a reference user finds every name they use
today (or its documented Spark-native analog).
"""

from __future__ import annotations

import feature_store_healthcare_spark as pkg
from feature_store_healthcare_spark import registry as reg
from feature_store_healthcare_spark import serving as srv
from feature_store_healthcare_spark import stores
from feature_store_healthcare_spark.streaming import pipeline as streaming_pipeline


def test_registry_public_symbols_have_engine_analogs():
    """ref feature_registry.py public classes → engine analogs.

    FeatureValue/FeatureVector (ref :182/:202) are Spark ROWS here (the
    EAV long table / the pivoted wide row) rather than Python dataclasses
    — the set-oriented re-expression documented in registry.py's module
    docstring; the serving-side FeatureVector dataclass survives for the
    vector read path."""
    analogs = {
        "FeatureValueType": reg.FeatureValueType,
        "FeatureStatus": reg.FeatureStatus,
        "FeatureCategory": reg.FeatureCategory,
        "FeatureSchema": reg.FeatureSchema,
        "FeatureSource": reg.FeatureSource,
        "Feature": reg.Feature,
        "FeatureGroup": reg.FeatureGroup,
        "FeatureRegistry": reg.FeatureRegistry,
        "FeatureVector": srv.FeatureVector,  # serving-side read path
    }
    for name, obj in analogs.items():
        assert obj is not None, name
        assert getattr(pkg, name, None) is not None or obj is srv.FeatureVector

    # reference FeatureRegistry public methods (ref :253-556)
    for method in (
        "register_feature",
        "activate_feature",
        "deprecate_feature",
        "create_feature_group",
        "ingest_feature_value",
        "get_feature_value",
        "get_feature_vector",
        "list_features",
    ):
        assert callable(getattr(reg.FeatureRegistry, method)), method


def test_serving_public_symbols_have_engine_analogs():
    """ref feature_server.py public classes/methods → engine analogs."""
    analogs = {
        "ServingMode": srv.ServingMode,
        "FeatureFreshness": srv.FeatureFreshness,
        "ServingConfig": srv.ServingConfig,
        "FeatureVector": srv.FeatureVector,
        "LRUCache": srv._LRUCache,  # request-level concern, kept private
        "FeatureServer": srv.FeatureServer,
    }
    for name, obj in analogs.items():
        assert obj is not None, name
    for method in (
        "get_online_features",
        "get_offline_features",
        "get_point_in_time_features",
        "write_features",
        "get_metrics",
    ):
        assert callable(getattr(srv.FeatureServer, method)), method


def test_parity_enums_match_reference_value_sets():
    assert {c.value for c in reg.FeatureCategory} == {
        "demographic", "clinical", "laboratory", "medication", "procedure",
        "diagnosis", "vital_sign", "imaging", "genomic", "behavioral",
        "social", "derived",
    }  # ref feature_registry.py:54-69
    assert {s.value for s in reg.FeatureStatus} == {
        "draft", "active", "deprecated", "archived",
    }  # ref :45-51
    assert {m.value for m in srv.ServingMode} == {
        "online", "offline", "streaming",
    }  # ref feature_server.py:33-38
    assert {f.value for f in srv.FeatureFreshness} == {
        "fresh", "stale", "expired",
    }  # ref :41-46


def test_serving_mode_maps_to_real_engine_paths():
    """Each ServingMode's documented engine path exists and is callable."""
    assert callable(srv.FeatureServer.get_online_features)  # ONLINE
    assert callable(stores.kv_point_get)  # ONLINE (exported KV)
    assert callable(srv.FeatureServer.get_offline_features)  # OFFLINE
    assert callable(srv.FeatureServer.get_point_in_time_features)  # OFFLINE
    assert callable(streaming_pipeline.streaming_online_upsert)  # STREAMING


def test_feature_category_accepted_and_normalized():
    """FeatureSchema accepts the enum, stores the reference's serialized
    form (a plain string), and list_features filters by either."""
    schema = reg.FeatureSchema(
        name="age", value_type=reg.FeatureValueType.INT32,
        category=reg.FeatureCategory.DEMOGRAPHIC,
    )
    assert schema.category == "demographic"
    assert schema.category == reg.FeatureCategory.DEMOGRAPHIC  # str-enum
    assert schema.to_dict()["category"] == "demographic"
    # unknown domain categories stay legal (documented divergence)
    free = reg.FeatureSchema(
        name="x", value_type=reg.FeatureValueType.STRING, category="custom"
    )
    assert free.category == "custom"
