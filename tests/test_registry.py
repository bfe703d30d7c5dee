"""Registry semantics vs the reference (SURVEY.md §5.2).

ACL deny (feature_registry.py:469-475), validation rejects (:558-577 with
the ref's defects fixed), lifecycle transitions (:332-355), versioned
content-hash ids (:617-630), point-in-time reads (:443-496).
"""

from __future__ import annotations

from datetime import datetime

import pytest

from feature_store_healthcare_spark.registry import (
    FeatureRegistry,
    FeatureSchema,
    FeatureSource,
    FeatureStatus,
    FeatureValueType,
    make_feature_id,
    make_group_id,
)


@pytest.fixture()
def registry(spark):
    return FeatureRegistry(spark)


def _register(registry, name="hba1c_latest", vt=FeatureValueType.FLOAT64, **kw):
    kw.setdefault("status", FeatureStatus.ACTIVE)
    return registry.register_feature(
        name=name,
        schema=FeatureSchema(name=name, value_type=vt, entity_type="patient"),
        source=FeatureSource(source_type="batch", source_location="lab_results"),
        owner="clinical-team",
        **kw,
    )


def test_content_hash_ids(registry):
    f = _register(registry)
    assert f.feature_id == make_feature_id("hba1c_latest", "1.0.0", "patient")
    assert f.feature_id.startswith("feat_") and len(f.feature_id) == 21
    # different version → different id (versioned features)
    f2 = _register(registry, version="2.0.0")
    assert f2.feature_id != f.feature_id


def test_phi_requires_roles(registry):
    with pytest.raises(ValueError, match="access_roles"):
        _register(registry, name="dx_code", phi_level="direct")
    ok = _register(registry, name="dx_code", phi_level="direct", access_roles=["clinician"])
    assert ok.phi_level.value == "direct"


def test_lifecycle_transitions(registry):
    f = _register(registry, status=FeatureStatus.DRAFT)
    with pytest.raises(ValueError, match="illegal"):
        registry.update_feature_status(f.feature_id, "archived" if False else "deprecated")
    registry.update_feature_status(f.feature_id, "active")
    registry.update_feature_status(f.feature_id, "deprecated", reason="superseded")
    assert registry.get_feature(f.feature_id).tags["deprecation_reason"] == "superseded"
    registry.update_feature_status(f.feature_id, "archived")
    with pytest.raises(ValueError, match="illegal"):
        registry.update_feature_status(f.feature_id, "active")


def test_ingest_requires_active(registry):
    f = _register(registry, status=FeatureStatus.DRAFT)
    with pytest.raises(ValueError, match="not active"):
        registry.ingest_feature_value(f.feature_id, "p1", 6.5)


@pytest.mark.parametrize(
    "vt,good,bad",
    [
        (FeatureValueType.INT64, 42, "x"),
        (FeatureValueType.INT64, 42, True),  # ref defect: bool passed as int
        (FeatureValueType.FLOAT64, 6.5, "6.5"),
        (FeatureValueType.STRING, "s", 1),
        (FeatureValueType.BOOL, True, 1),
        (FeatureValueType.TIMESTAMP, datetime(2024, 1, 1), "2024"),  # ref: unvalidated
        (FeatureValueType.ARRAY_STRING, ["a"], [1]),  # ref: unvalidated
        (FeatureValueType.ARRAY_FLOAT, [1.0, 2], ["a"]),
    ],
)
def test_type_validation(registry, vt, good, bad):
    f = _register(registry, name=f"typed_{vt.value}_{str(bad)[:8]}", vt=vt)
    registry.ingest_feature_value(f.feature_id, "p1", good)
    with pytest.raises(ValueError):
        registry.ingest_feature_value(f.feature_id, "p1", bad)


def test_embedding_dim_check(registry):
    f = registry.register_feature(
        name="emb",
        schema=FeatureSchema(
            name="emb", value_type=FeatureValueType.EMBEDDING,
            entity_type="patient", embedding_dim=4,
        ),
        source=FeatureSource(),
        owner="ml",
        status=FeatureStatus.ACTIVE,
    )
    registry.ingest_feature_value(f.feature_id, "p1", [1.0, 2.0, 3.0, 4.0])
    with pytest.raises(ValueError, match="dim"):
        registry.ingest_feature_value(f.feature_id, "p1", [1.0, 2.0])


def test_point_in_time_read_and_acl(registry):
    f = _register(registry, phi_level="indirect", access_roles=["clinician"])
    registry.ingest_feature_value(f.feature_id, "p1", 6.0, "2024-01-01 00:00:00")
    registry.ingest_feature_value(f.feature_id, "p1", 7.0, "2024-02-01 00:00:00")

    # ACL: role overlap required for PHI (ref :469-475)
    with pytest.raises(PermissionError):
        registry.get_feature_value(f.feature_id, "p1", user_id="u1", user_roles=["analyst"])
    denied = [r for r in registry._access_log if r["action"] == "access_denied"]
    assert len(denied) == 1

    v = registry.get_feature_value(
        f.feature_id, "p1", user_id="u1", user_roles=["clinician"]
    )
    assert v == 7.0
    v_asof = registry.get_feature_value(
        f.feature_id, "p1", as_of="2024-01-15 00:00:00",
        user_id="u1", user_roles=["clinician"],
    )
    assert v_asof == 6.0  # leak check
    granted = [r for r in registry._access_log if r["action"] == "access"]
    assert len(granted) == 2  # audit_all_access


def test_feature_vector_nulls_denied(registry):
    open_f = _register(registry, name="open_feat")
    phi_f = _register(registry, name="phi_feat", phi_level="direct", access_roles=["admin"])
    registry.ingest_feature_value(open_f.feature_id, "p1", 1.0)
    registry.ingest_feature_value(phi_f.feature_id, "p1", 2.0)
    vec = registry.get_feature_vector(
        "p1", [open_f.feature_id, phi_f.feature_id], user_roles=["analyst"]
    )
    assert vec == {"open_feat": 1.0, "phi_feat": None}  # ref :526-528


def test_group_entity_homogeneity(registry):
    a = _register(registry, name="fa")
    b = registry.register_feature(
        name="fb",
        schema=FeatureSchema(name="fb", value_type=FeatureValueType.INT64, entity_type="encounter"),
        source=FeatureSource(),
        owner="o",
    )
    with pytest.raises(ValueError, match="entity_type"):
        registry.create_feature_group("g", "patient", [a.feature_id, b.feature_id])
    g = registry.create_feature_group("g", "patient", [a.feature_id])
    assert g.group_id == make_group_id("g", "patient")


def test_parquet_persistence_roundtrip(spark, tmp_path):
    reg = FeatureRegistry(spark, storage_dir=str(tmp_path))
    f = _register(reg)
    reg.ingest_feature_value(f.feature_id, "p1", 5.5, "2024-01-01 00:00:00")
    reg.flush()
    reg.ingest_feature_value(f.feature_id, "p1", 6.5, "2024-01-02 00:00:00")
    # buffer ∪ persisted view sees both
    assert reg.values_df().count() == 2
    assert reg.get_feature_value(f.feature_id, "p1") == 6.5


def test_validation_rules_enforced_at_ingest(spark, tmp_path):
    """§2.10: validation_rules (dead config in the reference) are evaluated
    as Spark SQL boolean expressions over `value`."""
    from feature_store_healthcare_spark.registry import (
        FeatureRegistry, FeatureSchema, FeatureSource, FeatureStatus, FeatureValueType,
    )

    reg = FeatureRegistry(spark, storage_dir=str(tmp_path / "reg"))
    f = reg.register_feature(
        name="hba1c",
        schema=FeatureSchema(
            name="hba1c", value_type=FeatureValueType.FLOAT64,
            entity_type="patient", category="laboratory",
            validation_rules=["value >= 3.0 AND value <= 20.0"],
        ),
        source=FeatureSource(source_type="batch"),
        owner="t",
    )
    reg.update_feature_status(f.feature_id, FeatureStatus.ACTIVE)
    reg.ingest_feature_value(f.feature_id, "p1", 6.5)  # in range → ok
    import pytest as _pt

    with _pt.raises(ValueError, match="validation_rules"):
        reg.ingest_feature_value(f.feature_id, "p1", 99.0)  # out of range


def test_apply_validation_rules_quarantine_split(spark):
    from feature_store_healthcare_spark.registry import (
        FeatureRegistry, FeatureSchema, FeatureSource, FeatureValueType,
    )

    reg = FeatureRegistry(spark)
    f = reg.register_feature(
        name="bp_sys",
        schema=FeatureSchema(
            name="bp_sys", value_type=FeatureValueType.INT64,
            entity_type="patient",
            validation_rules=["value > 0", "value < 300"],
        ),
        source=FeatureSource(source_type="batch"),
        owner="t",
    )
    df = spark.createDataFrame([(120,), (0,), (500,), (90,)], "reading long")
    ok, bad = reg.apply_validation_rules(df, f, "reading")
    assert sorted(r.reading for r in ok.collect()) == [90, 120]
    assert sorted(r.reading for r in bad.collect()) == [0, 500]


def test_materialize_derived_feature_runs_transformation_logic(spark, sf_dir, tmp_path):
    """§2.10: transformation_logic (stored-but-never-run in the reference)
    executes as a SQL expression over a source DataFrame."""
    from feature_store_healthcare_spark.registry import (
        FeatureRegistry, FeatureSchema, FeatureSource, FeatureStatus, FeatureValueType,
    )
    from feature_store_healthcare_spark.sources import load_table

    reg = FeatureRegistry(spark, storage_dir=str(tmp_path / "reg"))
    f = reg.register_feature(
        name="order_value_eur",
        schema=FeatureSchema(
            name="order_value_eur", value_type=FeatureValueType.FLOAT64,
            entity_type="customer", validation_rules=["value >= 0"],
        ),
        source=FeatureSource(
            source_type="derived",
            transformation_logic="o_totalprice * 0.92",
        ),
        owner="t",
    )
    orders = load_table(spark, sf_dir, "orders").limit(50)
    rows_df = reg.materialize_derived_feature(
        f.feature_id, orders, entity_col="o_custkey", ts_col="o_orderdate"
    )
    rows = rows_df.collect()
    assert len(rows) == 50
    import collections
    want = collections.Counter(
        (str(r.o_custkey), round(r.o_totalprice * 0.92, 6)) for r in orders.collect()
    )
    got = collections.Counter(
        (r.entity_id, round(r.value_double, 6)) for r in rows
    )
    assert got == want
    assert all(r.feature_id == f.feature_id for r in rows)
    from pyspark.sql import functions as F
    reg.update_feature_status(f.feature_id, FeatureStatus.ACTIVE)
    reg.ingest_values_df(rows_df)
    assert reg.values_df().where(F.col("feature_id") == f.feature_id).count() == 50


def test_values_store_partition_pruning(spark, tmp_path):
    """The persisted value store is partitioned by event_date; a dated
    as-of read must prune partitions at the scan (the 100 TB contract)."""
    from datetime import datetime

    from feature_store_healthcare_spark import plans
    from feature_store_healthcare_spark.registry import (
        FeatureRegistry, FeatureSchema, FeatureSource, FeatureStatus, FeatureValueType,
    )

    reg = FeatureRegistry(spark, storage_dir=str(tmp_path / "reg"))
    f = reg.register_feature(
        name="hr",
        schema=FeatureSchema(name="hr", value_type=FeatureValueType.INT64,
                             entity_type="patient"),
        source=FeatureSource(source_type="batch"),
        owner="t",
    )
    reg.update_feature_status(f.feature_id, FeatureStatus.ACTIVE)
    for day in (1, 2, 3):
        reg.ingest_feature_value(f.feature_id, "p1", 60 + day,
                                 event_timestamp=datetime(2024, 1, day))
    from pyspark.sql import functions as F
    reg.flush()
    pruned = reg.values_df().where(F.col("event_date") == "2024-01-02")
    plan = plans.physical_plan(pruned)
    assert "PartitionFilters" in plan and "2024-01-02" in plan
    assert pruned.count() == 1


def test_materialization_order_topological(spark):
    """Dependencies materialize before dependents; deterministic order;
    cycles rejected."""
    from feature_store_healthcare_spark.registry import (
        FeatureRegistry, FeatureSchema, FeatureSource, FeatureValueType,
    )

    reg = FeatureRegistry(spark)

    def mk(name, deps=()):
        return reg.register_feature(
            name=name,
            schema=FeatureSchema(name=name, value_type=FeatureValueType.FLOAT64,
                                 entity_type="patient"),
            source=FeatureSource(source_type="derived" if deps else "batch",
                                 transformation_logic="value * 1.0" if deps else None),
            owner="t",
            dependencies=list(deps),
        )

    base_a = mk("base_a")
    base_b = mk("base_b")
    mid = mk("mid", [base_a.feature_id, base_b.feature_id])
    top = mk("top", [mid.feature_id, base_a.feature_id])

    order = reg.materialization_order()
    pos = {fid: i for i, fid in enumerate(order)}
    assert pos[base_a.feature_id] < pos[mid.feature_id]
    assert pos[base_b.feature_id] < pos[mid.feature_id]
    assert pos[mid.feature_id] < pos[top.feature_id]

    # restricted: top pulls its transitive closure only
    sub = reg.materialization_order([top.feature_id])
    assert set(sub) == {base_a.feature_id, base_b.feature_id, mid.feature_id, top.feature_id}
    assert sub == reg.materialization_order([top.feature_id])  # deterministic

    # cycle detection: close a loop behind the validator's back
    reg.get_feature(base_a.feature_id).dependencies.append(top.feature_id)
    import pytest as _pt
    with _pt.raises(ValueError, match="cycle"):
        reg.materialization_order()


def test_system_time_travel_reproduces_past_reads(registry):
    """Bitemporal ingestion-time travel: a (as_of, system_time) read pair
    reproduces what the system knew at system_time, even after a late
    correction re-states the same event time with a new value."""
    import time
    from datetime import datetime, timezone

    f = _register(registry, name="glucose")
    registry.ingest_feature_value(f.feature_id, "p1", 100.0,
                                  event_timestamp="2024-03-01T10:00:00")
    time.sleep(0.002)
    t_between = datetime.now(timezone.utc).replace(tzinfo=None)
    time.sleep(0.002)
    # late correction: same event time, new value, ingested later
    registry.ingest_feature_value(f.feature_id, "p1", 105.0,
                                  event_timestamp="2024-03-01T10:00:00")

    as_of = "2024-03-01T12:00:00"
    # current read sees the correction (created_ts tie-break)
    assert registry.get_feature_value(f.feature_id, "p1", as_of=as_of) == 105.0
    # replay as of t_between: the correction is invisible
    assert registry.get_feature_value(
        f.feature_id, "p1", as_of=as_of, system_time=t_between
    ) == 100.0
    # replay before anything was ingested: nothing known
    assert registry.get_feature_value(
        f.feature_id, "p1", as_of=as_of, system_time="2020-01-01T00:00:00"
    ) is None


def test_feature_to_dict_roundtrips_json(spark):
    """Serialization parity with the reference's to_dict surface
    (feature_registry.py:84-154): every field JSON-serializable, enums as
    string values, nested schema/source dicts."""
    import json

    reg = FeatureRegistry(spark)
    f = reg.register_feature(
        name="td",
        schema=FeatureSchema(
            name="td", value_type=FeatureValueType.FLOAT64,
            description="d", category="lab", entity_type="patient",
        ),
        source=FeatureSource(source_type="batch", source_location="/x"),
        owner="o",
        phi_level="indirect",
        access_roles=["clinician"],
    )
    d = f.to_dict()
    json.dumps(d)  # fully serializable
    assert d["schema"]["value_type"] == "float64"
    assert d["source"]["source_location"] == "/x"
    assert d["status"] == "draft" and d["phi_level"] == "indirect"
    assert d["feature_id"] == f.feature_id
    assert d["retention_days"] == 2555
