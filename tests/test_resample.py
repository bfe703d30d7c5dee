"""Resample-to-daily-grain + forward fill."""

from __future__ import annotations

import datetime

from feature_store_healthcare_spark.operators import resample


def _obs(spark):
    rows = [
        ("u1", datetime.datetime(2024, 3, 1, 9), 10.0, 1),
        ("u1", datetime.datetime(2024, 3, 1, 18), 11.0, 2),  # same day, newer
        ("u1", datetime.datetime(2024, 3, 4, 12), 40.0, 3),
        ("u2", datetime.datetime(2024, 3, 3, 1), 7.0, 4),
    ]
    return spark.createDataFrame(
        rows, "user string, ts timestamp, value double, eid int"
    )


def test_daily_latest_picks_newest_per_day(spark):
    out = resample.daily_latest(_obs(spark), "user", "ts", "value", tiebreak=["eid"])
    got = {(r.user, str(r.day)): r.value for r in out.collect()}
    assert got[("u1", "2024-03-01")] == 11.0
    assert got[("u1", "2024-03-04")] == 40.0
    assert got[("u2", "2024-03-03")] == 7.0


def test_resample_ffill_grid_fill_and_staleness(spark):
    out = resample.resample_ffill(
        _obs(spark), "user", "ts", "value",
        start="2024-03-01", end="2024-03-05", tiebreak=["eid"],
    ).collect()
    # full grid: 2 users × 5 days
    assert len(out) == 10
    got = {(r.user, str(r.day)): (r.value, r.days_since_obs) for r in out}
    assert got[("u1", "2024-03-01")] == (11.0, 0)
    assert got[("u1", "2024-03-02")] == (11.0, 1)  # filled, 1 day stale
    assert got[("u1", "2024-03-03")] == (11.0, 2)
    assert got[("u1", "2024-03-04")] == (40.0, 0)  # new observation resets
    assert got[("u1", "2024-03-05")] == (40.0, 1)
    # before u2's first observation: null value, null staleness (no leak
    # from the future)
    assert got[("u2", "2024-03-01")] == (None, None)
    assert got[("u2", "2024-03-03")] == (7.0, 0)
    assert got[("u2", "2024-03-05")] == (7.0, 2)


def test_sessionize_gap_boundaries(spark):
    rows = [
        ("u1", datetime.datetime(2024, 3, 1, 9, 0), 1),
        ("u1", datetime.datetime(2024, 3, 1, 10, 0), 2),   # 1h gap: same session
        ("u1", datetime.datetime(2024, 3, 1, 12, 0), 3),   # exactly 2h: same (> not >=)
        ("u1", datetime.datetime(2024, 3, 1, 14, 0, 1), 4),  # 2h + 1s: NEW session
        ("u2", datetime.datetime(2024, 3, 1, 9, 0), 5),    # other entity: own session 1
    ]
    df = spark.createDataFrame(rows, "user string, ts timestamp, eid int")
    out = resample.sessionize(df, "user", "ts", gap=2 * 3600, tiebreak=["eid"])
    got = {r.eid: r.session_id for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1}
    # the helper column never leaks into the output schema
    assert "__new_s" not in out.columns
    # multi-column entity + custom output name
    out2 = resample.sessionize(
        df, ["user", "eid"], "ts", gap=1, session_col="s"
    )
    assert all(r.s == 1 for r in out2.collect())  # every row its own entity
