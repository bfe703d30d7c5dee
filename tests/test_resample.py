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
