"""KV export tests: the client-side bucket function must agree with the
Spark-side one, point gets must prune to a single bucket directory at the
scan, and values must round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_store_healthcare_spark import plans
from feature_store_healthcare_spark.stores import (
    export_online_kv,
    kv_bucket_col,
    kv_bucket_py,
    kv_point_get,
)


def _latest(spark, n=500):
    return spark.range(n).select(
        F.when(F.col("id") % 2 == 0, "patient").otherwise("provider").alias("entity_type"),
        F.concat(F.lit("e"), F.col("id")).alias("entity_id"),
        (F.col("id") * 1.5).alias("heart_rate"),
        F.lit("2024-01-02 03:04:05").cast("timestamp_ntz").alias("event_timestamp"),
    )


def test_bucket_functions_agree(spark):
    df = _latest(spark, 100).withColumn("__b", kv_bucket_col(n_buckets=16))
    for r in df.select("entity_type", "entity_id", "__b").collect():
        assert kv_bucket_py(r.entity_type, r.entity_id, 16) == r["__b"]


def test_point_get_prunes_and_roundtrips(spark, tmp_path):
    path = str(tmp_path / "kv")
    export_online_kv(_latest(spark), path, n_buckets=16)
    got = kv_point_get(spark, path, "patient", "e42", n_buckets=16)
    plan = plans.physical_plan(got)
    assert "PartitionFilters" in plan and "__kvb" in plan
    rows = got.collect()
    assert len(rows) == 1
    assert rows[0].heart_rate == 42 * 1.5
    # absent key → empty, same pruned shape
    assert kv_point_get(spark, path, "patient", "nope", n_buckets=16).count() == 0
