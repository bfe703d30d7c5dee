"""CDC materialization, column profiling, temporal split."""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_store_healthcare_spark.operators import cdc, profile, sampling


def _changelog(spark, rows):
    return spark.createDataFrame(
        rows, "k string, ts int, value double, seq int, op string"
    )


def test_materialize_latest_wins_and_delete_drops(spark):
    ch = _changelog(
        spark,
        [
            ("a", 1, 1.0, 1, "U"),
            ("a", 3, 3.0, 2, "U"),
            ("a", 2, 2.0, 3, "U"),  # older than seq=2 → loses despite seq
            ("b", 1, 1.0, 4, "U"),
            ("b", 2, 0.0, 5, "D"),  # newest change is a delete → key gone
            ("c", 5, 9.0, 6, "D"),
            ("c", 6, 7.0, 7, "U"),  # un-delete: newer upsert resurrects
        ],
    )
    out = {r.k: r for r in cdc.materialize(ch, ["k"], "ts", tiebreak=["seq"]).collect()}
    assert set(out) == {"a", "c"}
    assert out["a"].value == 3.0
    assert out["c"].value == 7.0
    assert "op" not in cdc.materialize(ch, ["k"], "ts").columns


def test_apply_changes_out_of_order_guard(spark):
    snap = spark.createDataFrame(
        [("a", 10, 5.0, 1)], "k string, ts int, value double, seq int"
    )
    late = _changelog(spark, [("a", 4, 99.0, 2, "U")])  # older than snapshot
    out = cdc.apply_changes(snap, late, ["k"], "ts", tiebreak=["seq"]).collect()
    assert len(out) == 1 and out[0].value == 5.0  # late change lost


def test_snapshot_plus_delta_equals_single_fold(spark):
    rows = [
        (f"k{i % 7}", t, float(i), i, "D" if i % 5 == 0 else "U")
        for i, t in enumerate(range(100))
    ]
    ch = _changelog(spark, rows)
    single = cdc.materialize(ch, ["k"], "ts", tiebreak=["seq"])
    snap = cdc.materialize(ch.where("ts < 50"), ["k"], "ts", tiebreak=["seq"])
    two_phase = cdc.apply_changes(
        snap, ch.where("ts >= 50"), ["k"], "ts", tiebreak=["seq"]
    )
    key = lambda r: r.k  # noqa: E731
    assert sorted(single.collect(), key=key) == sorted(two_phase.collect(), key=key)


def test_column_profile_counts(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (2, "y"), (None, "x")], "a int, b string"
    )
    out = {r.column: r for r in profile.column_profile(df, ["a", "b"]).collect()}
    assert out["a"].n_rows == 4 and out["a"].n_values == 3
    assert out["a"].n_nulls == 1 and out["a"].n_distinct == 2
    assert out["a"].min_value == "1" and out["a"].max_value == "2"
    assert out["b"].n_nulls == 1 and out["b"].n_distinct == 2
    assert out["b"].min_value == "x" and out["b"].max_value == "y"


def test_column_profile_approx_mode_runs(spark):
    df = spark.range(1000).withColumn("v", F.col("id") % 10)
    out = {r.column: r for r in profile.column_profile(df, ["v"], exact=False).collect()}
    assert abs(out["v"].n_distinct - 10) <= 2  # HLL estimate


def test_leave_last_k_split_labels(spark):
    rows = [("u1", t, t) for t in range(5)] + [("u2", 0, 10)]
    df = spark.createDataFrame(rows, "user string, ts int, eid int")
    out = sampling.leave_last_k_split(
        df, "user", "ts", tiebreak=["eid"], k_test=1, k_val=1
    ).collect()
    by_user_ts = {(r.user, r.ts): r.split for r in out}
    assert by_user_ts[("u1", 4)] == "test"
    assert by_user_ts[("u1", 3)] == "val"
    assert by_user_ts[("u1", 2)] == "train"
    # an entity with fewer rows than k_test+k_val just fills from the top
    assert by_user_ts[("u2", 0)] == "test"
    assert len(out) == 6  # pure tagging — no rows added or dropped


def test_snapshot_diff_roundtrip(spark):
    """apply_changes(old, diff) == new — the diff is the exact inverse."""
    from pyspark.sql import functions as F  # noqa: F811

    old = spark.createDataFrame(
        [("a", 1, 10.0), ("b", 1, 20.0), ("c", 1, 30.0)],
        "k string, ts int, value double",
    )
    new = spark.createDataFrame(
        [("a", 1, 10.0), ("b", 5, 99.0), ("d", 5, 40.0)],
        "k string, ts int, value double",
    )
    diff = cdc.snapshot_diff(old, new, ["k"])
    got = {r.k: r.op for r in diff.collect()}
    # a unchanged → absent; b changed → U; c gone → D; d new → U
    assert got == {"b": "U", "c": "D", "d": "U"}

    # stamp the diff newer than everything in `old` and apply
    applied = cdc.apply_changes(
        old, diff.withColumn("ts", F.lit(100)), ["k"], "ts"
    )
    want = {(r.k, r.value) for r in new.collect()}
    assert {(r.k, r.value) for r in applied.collect()} == want


def test_snapshot_diff_null_payload_fields(spark):
    old = spark.createDataFrame([("a", None), ("b", 1.0)], "k string, v double")
    new = spark.createDataFrame([("a", None), ("b", None)], "k string, v double")
    got = {r.k: r.op for r in cdc.snapshot_diff(old, new, ["k"]).collect()}
    # a: null == null → unchanged (eqNullSafe); b: 1.0 → null IS a change
    assert got == {"b": "U"}
