"""Record linkage (blocked fuzzy match) and decayed counters."""

from __future__ import annotations

import datetime
import math

import pytest
from pyspark.sql import functions as F

from feature_store_healthcare_spark.operators import decay, linkage


def test_linkage_recovers_ground_truth(spark, sf_dir):
    from feature_store_healthcare_spark import queries as catalog

    out = catalog.queries()["record_linkage_best_match"](spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        # corruption replaced the last char, so the true row is distance 1
        # and (distance, custkey)-argmin must recover exactly it
        assert r.matched_custkey == r.probe_id
        assert r.distance == 1
        assert r.n_candidates >= 1


def test_linkage_blocking_bounds_pairs(spark):
    probes = spark.createDataFrame(
        [("p1", "abcde", "ab")], "pid string, probe_name string, pb string"
    )
    corpus = spark.createDataFrame(
        [("c1", "abcdx", "ab"), ("c2", "abzzz", "ab"), ("c3", "abcde", "zz")],
        "cid string, c_name string, cb string",
    )
    cands = linkage.candidates(
        probes, corpus, "probe_name", "c_name",
        probe_block=F.col("pb"), corpus_block=F.col("cb"), max_dist=2,
    ).collect()
    # c3 is an exact name match but in another block → unseen; c2 too far
    assert [(r.pid, r.cid, r.distance) for r in cands] == [("p1", "c1", 1)]


def test_best_match_argmin_and_tiebreak(spark):
    cands = spark.createDataFrame(
        [("p", "a", 2), ("p", "b", 1), ("p", "c", 1)],
        "pid string, cid string, distance int",
    )
    out = linkage.best_match(cands, "pid", tiebreak="cid").collect()
    assert len(out) == 1
    assert out[0].cid == "b" and out[0].n_candidates == 3


def test_decay_weight_half_life(spark):
    as_of = int(
        datetime.datetime(2024, 2, 1, tzinfo=datetime.timezone.utc).timestamp() * 1e6
    )
    rows = [
        ("u", datetime.datetime(2024, 2, 1), 10.0),   # age 0 → weight 1
        ("u", datetime.datetime(2024, 1, 25), 10.0),  # age 7d → weight 0.5
        ("v", datetime.datetime(2024, 1, 18), 8.0),   # age 14d → weight 0.25
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = {
        r.k: r
        for r in decay.decayed_counters(
            df, ["k"], "ts", "value", as_of_micros=as_of, half_life_days=7.0
        ).collect()
    }
    assert out["u"].decayed_count == pytest.approx(1.5, abs=1e-9)
    assert out["u"].decayed_sum == pytest.approx(15.0, abs=1e-9)
    assert out["v"].decayed_count == pytest.approx(0.25, abs=1e-9)
    assert out["v"].decayed_sum == pytest.approx(2.0, abs=1e-9)
    assert out["u"].n_events == 2


def test_decay_merge_algebra(spark):
    # decayed state is mergeable: decaying an old aggregate by Δt then
    # adding the new batch equals aggregating everything at the new as_of.
    t0 = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    rows_old = [("k", datetime.datetime(2024, 1, 1, h), 1.0) for h in range(5)]
    rows_new = [("k", datetime.datetime(2024, 1, 3, h), 1.0) for h in range(3)]
    df_old = spark.createDataFrame(rows_old, "k string, ts timestamp, value double")
    df_new = spark.createDataFrame(rows_new, "k string, ts timestamp, value double")
    both = df_old.unionByName(df_new)

    as_of1 = int((t0 + datetime.timedelta(days=2)).timestamp() * 1e6)
    as_of2 = int((t0 + datetime.timedelta(days=4)).timestamp() * 1e6)
    s1 = decay.decayed_counters(df_old, ["k"], "ts", "value", as_of1, 7.0, round_to=12)
    s2 = decay.decayed_counters(both, ["k"], "ts", "value", as_of2, 7.0, round_to=12)
    new_only = decay.decayed_counters(df_new, ["k"], "ts", "value", as_of2, 7.0, round_to=12)
    fade = 2.0 ** (-2.0 / 7.0)  # two days at 7-day half-life
    merged = s1.collect()[0].decayed_count * fade + new_only.collect()[0].decayed_count
    assert s2.collect()[0].decayed_count == pytest.approx(merged, rel=1e-9)
