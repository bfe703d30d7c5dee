"""The Delta Lake binding of the tableops seam (tableops_delta.py).

Two layers:

- **Container-runnable parity pins** (always run): the Delta binding
  imports without the ``delta`` package, exposes the SAME call surface
  as the plain-parquet ``tableops`` implementation (signature-for-
  signature, so the import-site swap the seam promises is mechanical),
  and builds the MATCHED-newer MERGE guard correctly (pure string
  construction).

- **Env-gated integration** (skipped here — this container ships no
  ``delta-spark``, the same gate discipline as the protobuf-gated
  ``streaming_decayed_counters_v2``): executes every operation against
  real Delta tables — MERGE newer-wins + replay idempotence, the
  overwrite-commit fold, txnAppId/txnVersion append replay skipping,
  and OPTIMIZE compaction.  Run it anywhere with
  ``pip install delta-spark`` to pin the mapping as executable.
"""

from __future__ import annotations

import importlib.util
import inspect

import pytest

from feature_store_healthcare_spark import tableops, tableops_delta

HAVE_DELTA = importlib.util.find_spec("delta") is not None


class TestSeamParity:
    """Runnable in THIS container: the swap contract, pinned."""

    @pytest.mark.parametrize("name", ["upsert", "merge_fold", "append"])
    def test_signatures_match(self, name):
        plain = inspect.signature(getattr(tableops, name))
        delta = inspect.signature(getattr(tableops_delta, name))
        assert list(plain.parameters) == list(delta.parameters), name
        for p, d in zip(plain.parameters.values(), delta.parameters.values()):
            assert p.default == d.default, (name, p.name)

    def test_idempotent_discipline_exists(self):
        # tableops.idempotent_commit's marker pair maps to the txn
        # identity options on the Delta append
        sig = inspect.signature(tableops_delta.append_idempotent)
        assert {"txn_id", "batch_id"} <= set(sig.parameters)

    def test_newer_condition_single_column(self):
        assert tableops_delta.newer_condition("ts") == "(b.`ts` > s.`ts`)"

    def test_newer_condition_lexicographic_tiebreak(self):
        got = tableops_delta.newer_condition("ts", ["seq", "src"])
        assert got == (
            "(b.`ts` > s.`ts`)"
            " OR (b.`ts` <=> s.`ts` AND b.`seq` > s.`seq`)"
            " OR (b.`ts` <=> s.`ts` AND b.`seq` <=> s.`seq` AND b.`src` > s.`src`)"
        )

    def test_module_imports_without_delta(self):
        # the gate must sit on CALLS, not on import
        assert tableops_delta.upsert is not None
        if not HAVE_DELTA:
            with pytest.raises(ImportError):
                tableops_delta._is_delta(None, "/tmp/nowhere")


@pytest.mark.skipif(not HAVE_DELTA, reason="delta-spark not installed in this container")
class TestDeltaIntegration:
    """Executes the mapping against real Delta tables (env-gated)."""

    @pytest.fixture(scope="class")
    def dspark(self):
        from delta import configure_spark_with_delta_pip
        from pyspark.sql import SparkSession

        builder = (
            SparkSession.builder.master("local[4]")
            .appName("tableops-delta-it")
            .config(
                "spark.sql.extensions",
                "io.delta.sql.DeltaSparkSessionExtension",
            )
            .config(
                "spark.sql.catalog.spark_catalog",
                "org.apache.spark.sql.delta.catalog.DeltaCatalog",
            )
            .config("spark.sql.shuffle.partitions", "4")
        )
        spark = configure_spark_with_delta_pip(builder).getOrCreate()
        if "delta" not in spark.conf.get("spark.sql.extensions", ""):
            pytest.skip(
                "an active SparkSession without the Delta extension exists; "
                "run this module standalone to integration-test the binding"
            )
        yield spark

    def test_upsert_newer_wins_and_replays_are_noops(self, dspark, tmp_path):
        path = str(tmp_path / "state")
        b1 = dspark.createDataFrame(
            [(1, 10, "a"), (2, 10, "b")], "k int, ts int, v string"
        )
        tableops_delta.upsert(b1, path, ["k"], "ts")
        newer = dspark.createDataFrame([(1, 20, "a2")], "k int, ts int, v string")
        stale = dspark.createDataFrame([(2, 5, "STALE")], "k int, ts int, v string")
        tableops_delta.upsert(newer, path, ["k"], "ts")
        tableops_delta.upsert(stale, path, ["k"], "ts")
        tableops_delta.upsert(newer, path, ["k"], "ts")  # replay
        got = {
            r.k: (r.ts, r.v)
            for r in dspark.read.format("delta").load(path).collect()
        }
        assert got == {1: (20, "a2"), 2: (10, "b")}

    def test_upsert_tiebreak_is_lexicographic(self, dspark, tmp_path):
        path = str(tmp_path / "tie")
        tableops_delta.upsert(
            dspark.createDataFrame([(1, 10, 1, "lo")], "k int, ts int, seq int, v string"),
            path, ["k"], "ts", tiebreak=["seq"],
        )
        tableops_delta.upsert(
            dspark.createDataFrame([(1, 10, 2, "hi")], "k int, ts int, seq int, v string"),
            path, ["k"], "ts", tiebreak=["seq"],
        )
        rows = dspark.read.format("delta").load(path).collect()
        assert [(r.k, r.v) for r in rows] == [(1, "hi")]

    def test_merge_fold_commits_fold_result(self, dspark, tmp_path):
        path = str(tmp_path / "fold")

        def fold(existing, batch):
            out = batch.groupBy("k").count()
            if existing is None:
                return out
            return (
                existing.unionByName(out)
                .groupBy("k")
                .sum("count")
                .withColumnRenamed("sum(count)", "count")
            )

        b = dspark.createDataFrame([(1,), (1,), (2,)], "k int")
        tableops_delta.merge_fold(b, path, fold)
        tableops_delta.merge_fold(b, path, fold)
        got = {r.k: r["count"] for r in dspark.read.format("delta").load(path).collect()}
        assert got == {1: 4, 2: 2}

    def test_append_idempotent_skips_replayed_txn(self, dspark, tmp_path):
        path = str(tmp_path / "idem")
        b = dspark.createDataFrame([(1,), (2,)], "k int")
        tableops_delta.append_idempotent(b, path, "stream-a", 0)
        tableops_delta.append_idempotent(b, path, "stream-a", 0)  # replay: skipped
        tableops_delta.append_idempotent(b, path, "stream-a", 1)  # new batch
        assert dspark.read.format("delta").load(path).count() == 4

    def test_compact_preserves_rows(self, dspark, tmp_path):
        path = str(tmp_path / "opt")
        for i in range(5):
            tableops_delta.append(
                dspark.createDataFrame([(i, i * 10)], "k int, v int"), path
            )
        before = dspark.read.format("delta").load(path).collect()
        tableops_delta.compact(dspark, path)
        after = dspark.read.format("delta").load(path).collect()
        assert sorted(map(tuple, after)) == sorted(map(tuple, before))
