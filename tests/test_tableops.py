"""Direct contract tests for tableops — the transactional-table-format
seam (round-10 VERDICT #6).  The streaming maintainers exercise these
through foreachBatch; here the MERGE-shaped interface is pinned on its
own so a Delta/Iceberg swap-in has an executable spec to reproduce.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from feature_store_healthcare_spark import tableops


def _rows(spark, path):
    return {
        (r.k, r.v, r.ts)
        for r in spark.read.parquet(path).select("k", "v", "ts").collect()
    }


def test_upsert_latest_wins_and_ts_guard(spark, tmp_path):
    """upsert = MERGE INTO with a newer-than guard: a late row older than
    the stored one LOSES; a newer row replaces; unseen keys insert."""
    state = str(tmp_path / "state")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10)], "k long, v string, ts long"
    )
    tableops.upsert(base, state, ["k"], "ts")
    assert _rows(spark, state) == {(1, "a", 10), (2, "b", 10)}
    batch = spark.createDataFrame(
        [(1, "late", 5), (2, "newer", 20), (3, "new", 1)],
        "k long, v string, ts long",
    )
    tableops.upsert(batch, state, ["k"], "ts")
    assert _rows(spark, state) == {(1, "a", 10), (2, "newer", 20), (3, "new", 1)}
    # replay-idempotent: re-applying the same batch changes nothing
    tableops.upsert(batch, state, ["k"], "ts")
    assert _rows(spark, state) == {(1, "a", 10), (2, "newer", 20), (3, "new", 1)}


def test_upsert_tiebreak_deterministic(spark, tmp_path):
    state = str(tmp_path / "state")
    batch = spark.createDataFrame(
        [(1, "x", 10, 1), (1, "y", 10, 2)], "k long, v string, ts long, seq long"
    )
    tableops.upsert(batch, state, ["k"], "ts", tiebreak=["seq"])
    got = spark.read.parquet(state).collect()
    assert len(got) == 1 and got[0].v == "y"  # higher seq wins the ts tie


def test_merge_fold_first_and_subsequent_commits(spark, tmp_path):
    state = str(tmp_path / "agg")

    def fold(existing, batch):
        b = batch.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
        if existing is None:
            return b
        return (
            existing.unionByName(b)
            .groupBy("k")
            .agg(F.sum("n").alias("n"))
        )

    b1 = spark.createDataFrame([(1,), (1,), (2,)], "k long")
    tableops.merge_fold(b1, state, fold)
    assert {(r.k, r.n) for r in spark.read.parquet(state).collect()} == {
        (1, 2), (2, 1)
    }
    b2 = spark.createDataFrame([(2,), (3,)], "k long")
    tableops.merge_fold(b2, state, fold, marker={"txn_id": "t", "batch_id": 4})
    assert {(r.k, r.n) for r in spark.read.parquet(state).collect()} == {
        (1, 2), (2, 2), (3, 1)
    }
    # the marker committed atomically inside the state dir
    mark = tableops.read_batch_marker(os.path.join(state, "_applied.json"))
    assert mark == {"txn_id": "t", "batch_id": 4}


def test_append_is_blind_and_additive(spark, tmp_path):
    path = str(tmp_path / "log")
    tableops.append(spark.createDataFrame([(1,)], "k long"), path)
    tableops.append(spark.createDataFrame([(2,)], "k long"), path)
    assert {r.k for r in spark.read.parquet(path).collect()} == {1, 2}


def test_upsert_recovers_interrupted_swap(spark, tmp_path):
    """A crash between 'state moved aside' and 'tmp moved in' leaves only
    the .old copy; the next upsert restores it before merging — the state
    never silently reinitializes from one batch."""
    import shutil

    state = str(tmp_path / "state")
    base = spark.createDataFrame([(1, "a", 10)], "k long, v string, ts long")
    tableops.upsert(base, state, ["k"], "ts")
    # simulate the crash window
    shutil.move(state, state + ".old")
    batch = spark.createDataFrame([(2, "b", 1)], "k long, v string, ts long")
    tableops.upsert(batch, state, ["k"], "ts")
    assert _rows(spark, state) == {(1, "a", 10), (2, "b", 1)}
