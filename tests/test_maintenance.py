"""Maintenance-job tests: per-feature retention enforcement (the ref
declares retention_days=2555 but never enforces it) and small-file
compaction of the append-only store.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from feature_store_healthcare_spark import maintenance
from feature_store_healthcare_spark.stores import AppendStore

NOW = datetime(2024, 6, 1)


@pytest.fixture()
def registry_df(spark):
    return spark.createDataFrame(
        [("f_short", 30), ("f_long", 2555)],
        "feature_id string, retention_days int",
    )


@pytest.fixture()
def values_df(spark):
    rows = [
        # f_short: 30-day retention → only rows after 2024-05-02 survive
        ("f_short", "e1", datetime(2024, 5, 20)),
        ("f_short", "e2", datetime(2024, 4, 1)),     # expired
        ("f_short", "e3", datetime(2024, 5, 2, 1)),  # just inside
        # f_long: 7-year retention → everything survives
        ("f_long", "e1", datetime(2018, 1, 1)),
        # unregistered feature → default 2555 days
        ("f_unknown", "e1", datetime(2023, 1, 1)),
    ]
    return spark.createDataFrame(
        rows, "feature_id string, entity_id string, event_timestamp timestamp_ntz"
    )


def test_retention_filter_per_feature(values_df, registry_df):
    kept = maintenance.retention_filter(values_df, registry_df, now=NOW)
    got = {(r.feature_id, r.entity_id) for r in kept.collect()}
    assert got == {
        ("f_short", "e1"),
        ("f_short", "e3"),
        ("f_long", "e1"),
        ("f_unknown", "e1"),
    }
    gone = maintenance.expired_rows(values_df, registry_df, now=NOW)
    assert {(r.feature_id, r.entity_id) for r in gone.collect()} == {("f_short", "e2")}


def test_apply_retention_rewrites_store(spark, values_df, registry_df, tmp_path):
    store = AppendStore(spark, str(tmp_path / "values"))
    store.append(values_df)
    removed = maintenance.apply_retention(store, registry_df, now=NOW)
    assert removed == 1
    left = store.read()
    assert left.count() == 4
    assert left.where(F.col("entity_id") == "e2").count() == 0
    # idempotent
    assert maintenance.apply_retention(store, registry_df, now=NOW) == 0


def test_compact_reduces_files(spark, tmp_path):
    store = AppendStore(spark, str(tmp_path / "log"))
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    for _ in range(5):  # five appends → many small files
        store.append(df.repartition(4))
    import glob

    before = len(glob.glob(f"{store.path}/*.parquet"))
    maintenance.compact(store, target_partitions=2)
    after = len(glob.glob(f"{store.path}/*.parquet"))
    assert after <= 2 < before
    assert store.read().count() == 500
