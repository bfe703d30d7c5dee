"""Serving semantics vs the reference: online reads + cache + freshness
(feature_server.py:206-288), set-oriented offline batch (:290-353), PIT
training join surface (:355-408), dual write + invalidation (:410-455),
metrics (:111-133).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest

from feature_store_healthcare_spark.registry import (
    FeatureRegistry,
    FeatureSchema,
    FeatureSource,
    FeatureStatus,
    FeatureValueType,
)
from feature_store_healthcare_spark.serving import FeatureServer, ServingConfig


def utcnow():
    return datetime.now(timezone.utc).replace(tzinfo=None)


@pytest.fixture()
def server(spark):
    registry = FeatureRegistry(spark)
    for name, vt in [("age", FeatureValueType.INT64), ("bp", FeatureValueType.FLOAT64)]:
        registry.register_feature(
            name=name,
            schema=FeatureSchema(name=name, value_type=vt, entity_type="patient"),
            source=FeatureSource(),
            owner="t",
            status=FeatureStatus.ACTIVE,
        )
    return FeatureServer(registry, ServingConfig(cache_ttl_seconds=300))


def _fid(server, name):
    return server.registry.get_feature_by_name(name, entity_type="patient").feature_id


def test_online_read_freshness_and_nullfill(server):
    now = utcnow()
    server.registry.ingest_feature_value(_fid(server, "age"), "p1", 40, now - timedelta(seconds=60))
    server.registry.ingest_feature_value(_fid(server, "bp"), "p1", 120.5, now - timedelta(hours=5))
    vec = server.get_online_features("p1", "patient", ["age", "bp", "missing_feat"])
    assert vec.features == {"age": 40, "bp": 120.5, "missing_feat": None}
    assert vec.freshness["age"] == "fresh"
    assert vec.freshness["bp"] == "stale"
    assert vec.freshness["missing_feat"] == "expired"  # null-fill (ref :520-527)
    assert vec.cache_hit is False
    assert vec.to_flat_dict()["age"] == 40


def test_cache_hit_and_write_invalidation(server):
    now = utcnow()
    server.registry.ingest_feature_value(_fid(server, "age"), "p1", 40, now)
    v1 = server.get_online_features("p1", "patient", ["age"])
    v2 = server.get_online_features("p1", "patient", ["age"])
    assert v1.cache_hit is False and v2.cache_hit is True
    # dual write invalidates entity cache entries + online table (ref :449)
    server.write_features("p1", "patient", {"age": 41}, timestamp=now + timedelta(seconds=1))
    v3 = server.get_online_features("p1", "patient", ["age"])
    assert v3.cache_hit is False and v3.features["age"] == 41
    m = server.get_metrics()
    assert m["total_requests"] == 3 and m["cache_hits"] == 1
    assert 0 < m["cache_hit_rate"] < 1


def test_offline_batch_is_set_oriented(server):
    """One plan for all entities (vs ref per-entity loop :313-316); unknown
    entities null-fill instead of failing (ref error isolation :331-342)."""
    now = utcnow()
    for ent, val in [("p1", 30), ("p2", 35)]:
        server.registry.ingest_feature_value(_fid(server, "age"), ent, val, now - timedelta(days=1))
    df = server.get_offline_features(["p1", "p2", "ghost"], "patient", ["age"], now)
    rows = {r.entity_id: r.age for r in df.collect()}
    assert rows == {"p1": 30, "p2": 35, "ghost": None}
    assert f"age__timestamp" in df.columns


def test_point_in_time_training_join(server):
    fid = _fid(server, "bp")
    server.registry.ingest_feature_value(fid, "p1", 110.0, "2024-01-01 00:00:00")
    server.registry.ingest_feature_value(fid, "p1", 130.0, "2024-01-10 00:00:00")
    spine = server.spark.createDataFrame(
        [
            ("p1", "2024-01-05 00:00:00", 1),
            ("p1", "2024-01-15 00:00:00", 0),
            ("p1", "2023-12-01 00:00:00", 1),
        ],
        "entity_id string, event_timestamp string, label int",  # ISO strings OK (ref :383-384)
    )
    out = server.get_point_in_time_features(spine, ["bp"])
    got = {str(r.event_timestamp): (r.bp, r.label) for r in out.collect()}
    assert got["2024-01-05 00:00:00"] == (110.0, 1)  # no leak from 01-10
    assert got["2024-01-15 00:00:00"] == (130.0, 0)
    assert got["2023-12-01 00:00:00"] == (None, 1)  # pre-history → null
    assert "bp__timestamp" in out.columns


def test_point_in_time_join_with_tolerance(server):
    fid = _fid(server, "bp")
    server.registry.ingest_feature_value(fid, "p1", 110.0, "2024-01-01 00:00:00")
    spine = server.spark.createDataFrame(
        [("p1", "2024-01-02 00:00:00", 1), ("p1", "2024-01-20 00:00:00", 0)],
        "entity_id string, event_timestamp string, label int",
    )
    out = server.get_point_in_time_features(
        spine, ["bp"], tolerance="INTERVAL 7 DAYS"
    )
    got = {str(r.event_timestamp): r.bp for r in out.collect()}
    assert got["2024-01-02 00:00:00"] == 110.0     # 1 day old: fresh enough
    assert got["2024-01-20 00:00:00"] is None      # 19 days old: null-fill


def test_freshness_report(server):
    now = utcnow()
    server.registry.ingest_feature_value(_fid(server, "age"), "p1", 1, now - timedelta(seconds=30))
    server.registry.ingest_feature_value(_fid(server, "age"), "p2", 2, now - timedelta(hours=2))
    server.registry.ingest_feature_value(_fid(server, "age"), "p3", 3, now - timedelta(days=3))
    got = {r.entity_id: r.freshness for r in server.freshness_report(now).collect()}
    assert got == {"p1": "fresh", "p2": "stale", "p3": "expired"}


def test_interpolated_feature_read(server, spark):
    base = datetime(2024, 1, 1)
    for day, v in [(1, 100.0), (5, 120.0)]:
        server.registry.ingest_feature_value(
            _fid(server, "bp"), "p1", v, base.replace(day=day)
        )
    spine = spark.createDataFrame(
        [
            ("p1", datetime(2024, 1, 3)),   # midpoint of 100 -> 120
            ("p1", datetime(2024, 1, 9)),   # after last -> hold
            ("p1", datetime(2023, 12, 1)),  # before first -> null
        ],
        "entity_id string, event_timestamp timestamp_ntz",
    )
    out = {r.event_timestamp: r for r in
           server.get_interpolated_features(spine, "bp").collect()}
    assert out[datetime(2024, 1, 3)].bp == pytest.approx(110.0)
    assert out[datetime(2024, 1, 3)].bp__prev == 100.0
    assert out[datetime(2024, 1, 9)].bp == 120.0
    assert out[datetime(2023, 12, 1)].bp is None


def test_interpolated_feature_rejects_non_numeric(spark):
    registry = FeatureRegistry(spark)
    registry.register_feature(
        name="note",
        schema=FeatureSchema(name="note", value_type=FeatureValueType.STRING, entity_type="patient"),
        source=FeatureSource(),
        owner="t",
        status=FeatureStatus.ACTIVE,
    )
    srv = FeatureServer(registry)
    spine = spark.createDataFrame(
        [("p1", datetime(2024, 1, 1))], "entity_id string, event_timestamp timestamp_ntz"
    )
    with pytest.raises(ValueError, match="numeric"):
        srv.get_interpolated_features(spine, "note")


def test_reference_api_aliases(spark, sf_dir):
    """Drop-in parity with the reference's named methods:
    activate/deprecate_feature on the registry (ref feature_registry.py:
    332-355) and reset_metrics on the server (ref feature_server.py)."""
    from feature_store_healthcare_spark.registry import (
        FeatureRegistry,
        FeatureSchema,
        FeatureSource,
        FeatureStatus,
        FeatureValueType,
    )

    reg = FeatureRegistry(spark)
    f = reg.register_feature(
        name="alias_check",
        schema=FeatureSchema(
            name="alias_check",
            value_type=FeatureValueType.FLOAT64,
            description="",
            category="lab",
            entity_type="patient",
        ),
        source=FeatureSource(source_type="batch", source_location="/x"),
        owner="t",
    )
    assert reg.activate_feature(f.feature_id).status is FeatureStatus.ACTIVE
    d = reg.deprecate_feature(f.feature_id, "superseded")
    assert d.status is FeatureStatus.DEPRECATED
    assert d.tags["deprecation_reason"] == "superseded"

    server = FeatureServer(reg)
    server._requests = 5
    server._latencies = [1.0, 2.0]
    server._cache.hits = 3
    server._cache.misses = 4
    server.reset_metrics()
    m = server.get_metrics()
    assert m["total_requests"] == 0 and m["cache_hits"] == 0
    assert m["avg_latency_ms"] == 0.0 and m["p99_latency_ms"] == 0.0
