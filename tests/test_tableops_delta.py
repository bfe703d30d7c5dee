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
        assert tableops_delta.newer_condition("ts") == (
            "((b.`ts` > s.`ts` OR (b.`ts` IS NOT NULL AND s.`ts` IS NULL)))"
        )

    def test_newer_condition_lexicographic_tiebreak(self):
        got = tableops_delta.newer_condition("ts", ["seq", "src"])
        gt = "(b.`{c}` > s.`{c}` OR (b.`{c}` IS NOT NULL AND s.`{c}` IS NULL))"
        assert got == (
            f"({gt.format(c='ts')})"
            f" OR (b.`ts` <=> s.`ts` AND {gt.format(c='seq')})"
            f" OR (b.`ts` <=> s.`ts` AND b.`seq` <=> s.`seq` AND {gt.format(c='src')})"
        )

    def test_newer_condition_null_ordering_matches_argmax(self, spark):
        """r12 ADVICE #5: the generated guard must place NULL lowest at
        every level, mirroring cdc.latest_change's max(struct) argmax —
        checked by evaluating the SQL on in-memory rows (no Delta
        runtime needed: the condition is plain Spark SQL)."""
        cond = tableops_delta.newer_condition("ts", ["seq"])
        cases = [
            # (batch ts, batch seq, state ts, state seq, should_update)
            (2, 0, 1, 0, True),     # plain newer
            (1, 0, 2, 0, False),    # plain older
            (None, 0, 1, 0, False), # NULL batch ts loses to non-NULL state
            (1, 0, None, 0, True),  # non-NULL batch beats NULL state ts
            (None, 2, None, 1, True),   # both NULL ts → seq tiebreak
            (None, 1, None, 1, False),  # full tie → keep state
            (None, None, None, 1, False),  # NULL seq loses at tie level
            (None, 1, None, None, True),
        ]
        df = spark.createDataFrame(
            [(i, *c[:4]) for i, c in enumerate(cases)],
            "id long, b_ts long, b_seq long, s_ts long, s_seq long",
        )
        sql_cond = (
            cond.replace("b.`ts`", "b_ts").replace("s.`ts`", "s_ts")
            .replace("b.`seq`", "b_seq").replace("s.`seq`", "s_seq")
        )
        from pyspark.sql import functions as F

        got = {
            r["id"]: bool(r["u"])
            for r in df.select(
                "id", F.coalesce(F.expr(sql_cond), F.lit(False)).alias("u")
            ).collect()
        }
        want = {i: c[4] for i, c in enumerate(cases)}
        assert got == want
        # and the argmax oracle agrees: for each case, latest_per_key
        # over {state, batch} picks the batch row iff should_update
        from feature_store_healthcare_spark.operators.pit import latest_per_key

        for i, (bts, bseq, sts, sseq, want_update) in enumerate(cases):
            pair = spark.createDataFrame(
                [("state", sts, sseq), ("batch", bts, bseq)],
                "who string, ts long, seq long",
            ).withColumn("k", F.lit(1))
            win = latest_per_key(pair, ["k"], "ts", tiebreak=["seq"]).collect()[0]
            # ties keep state in the MERGE; argmax breaks full ties on
            # the residual payload column, so only compare when the
            # (ts, seq) order is strict
            if (bts, bseq) != (sts, sseq):
                assert (win["who"] == "batch") == want_update, (i, win)

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
