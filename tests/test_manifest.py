"""Manifest-based file skipping (sources.manifest): stats correctness,
conservative pruning, and pruned-read ≡ full-read equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from feature_store_healthcare_spark.sources.manifest import (
    build_manifest,
    prune_files,
    pruned_read,
    write_manifest,
)


@pytest.fixture(scope="module")
def laid_out(spark, tmp_path_factory):
    """Orders-like data written as one file per o_month bucket so files
    have disjoint key ranges — the layout zorder_write/partitionBy
    produce."""
    path = str(tmp_path_factory.mktemp("manifest") / "orders")
    rows = [
        Row(k=i, month=(i // 100) + 1, v=float(i % 7))
        for i in range(1000)
    ]
    df = spark.createDataFrame(rows)
    (
        df.repartitionByRange(10, "k")
        .sortWithinPartitions("k")
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def test_manifest_stats_match_data(spark, laid_out):
    m = build_manifest(spark, laid_out, ["k", "month"])
    rows = m.collect()
    assert sum(r["n_rows"] for r in rows) == 1000
    assert len(rows) == 10
    # global min/max across files == table min/max
    assert min(r["min__k"] for r in rows) == 0
    assert max(r["max__k"] for r in rows) == 999
    assert all(r["nulls__k"] == 0 for r in rows)


def test_prune_drops_disjoint_files(spark, laid_out):
    m = build_manifest(spark, laid_out, ["k"])
    all_files = [r["file"] for r in m.select("file").collect()]
    hit = prune_files(m, "k", lower=150, upper=249)
    # range-partitioned by k into 10 files of ~100 -> at most 3 files overlap
    assert 1 <= len(hit) <= 3 < len(all_files)
    # no bound -> everything kept
    assert sorted(prune_files(m, "k")) == sorted(all_files)


def test_pruned_read_equals_full_read(spark, laid_out):
    m = build_manifest(spark, laid_out, ["k"])
    full = (
        spark.read.parquet(laid_out)
        .where((F.col("k") >= 150) & (F.col("k") <= 249))
        .collect()
    )
    pruned = pruned_read(spark, m, "k", lower=150, upper=249).collect()
    assert sorted(map(tuple, pruned)) == sorted(map(tuple, full))


def test_pruned_read_empty_range(spark, laid_out):
    m = build_manifest(spark, laid_out, ["k"])
    out = pruned_read(spark, m, "k", lower=5000, upper=6000)
    assert out.count() == 0
    assert "k" in out.columns


def test_all_null_file_prunes_for_range(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("manifest") / "nulls")
    a = spark.createDataFrame([Row(k=None, v=1)] * 10, schema="k int, v int")
    b = spark.createDataFrame([Row(k=5, v=2)] * 10, schema="k int, v int")
    a.coalesce(1).write.mode("overwrite").parquet(path)
    b.coalesce(1).write.mode("append").parquet(path)
    m = build_manifest(spark, path, ["k"])
    files = prune_files(m, "k", lower=0, upper=10)
    assert len(files) == 1  # the all-null file can't match a range pred
    got = pruned_read(spark, m, "k", lower=0, upper=10).collect()
    assert {r["v"] for r in got} == {2}


def test_manifest_roundtrip(spark, laid_out, tmp_path):
    m = build_manifest(spark, laid_out, ["k", "month"])
    mp = str(tmp_path / "manifest.parquet")
    write_manifest(m, mp)
    m2 = spark.read.parquet(mp)
    assert sorted(map(tuple, m.collect())) == sorted(map(tuple, m2.collect()))
