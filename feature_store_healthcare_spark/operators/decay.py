"""Time-decayed aggregate features ("decayed counters")
(★ driver-extension surface; the reference's freshness handling is a
3-bucket CASE — feature_server.py:107-108 — with no notion of smoothly
discounting old evidence).

A decayed counter weighs each event by ``2^(-age / half_life)`` and sums —
the standard recency-aware engagement/risk feature (counts and sums that
"forget" at a controlled rate).  Unlike a trailing window it never drops
an event at a cliff, and unlike EWMA-by-recursion it is a plain
commutative SUM: partial-aggregatable, one shuffle, mergeable across
batches (new evidence folds in by decaying the old state — the same
algebra incremental maintenance needs).

Determinism: ages are exact integer microseconds (no float until the one
division by the half-life), weights are ``exp`` of a double, and outputs
are rounded — bit-reproducible against an external SQL oracle.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def decay_weight(
    ts_col: Column | str, as_of_micros: int, half_life_days: float
) -> Column:
    """``2^(-age/half_life)`` as exp(-ln2 · age_days / half_life_days);
    age from exact microsecond longs, one double division."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    age_days = (F.lit(as_of_micros) - F.unix_micros(c.cast("timestamp"))) / F.lit(
        86400.0 * 1e6
    )
    return F.exp(F.lit(-math.log(2.0) / half_life_days) * age_days)


def decayed_counters(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    as_of_micros: int,
    half_life_days: float = 7.0,
    round_to: int = 6,
) -> DataFrame:
    """Per key: decayed event count, decayed value sum, plain count, and
    newest event time — one partial-aggregatable groupBy."""
    w = decay_weight(ts_col, as_of_micros, half_life_days)
    return df.groupBy(*keys).agg(
        F.round(F.sum(w), round_to).alias("decayed_count"),
        F.round(F.sum(w * F.col(value_col)), round_to).alias("decayed_sum"),
        F.count(F.lit(1)).alias("n_events"),
        F.max(ts_col).alias("last_ts"),
    )
