"""Time-series resampling to a fixed grain with forward fill
(★ driver-extension surface; the reference serves only the single latest
value per feature — feature_server.py:313 — and cannot produce the
regular-grid history a sequence model trains on).

``resample_ffill`` turns an irregular event stream into one row per
(entity, day): the day's newest observation, forward-filled across
observation gaps, plus the staleness (days since the filled value was
observed) — the classic "resample('1D').ffill()" with an explicit
staleness feature, leak-free because fills only ever look backward.

Plan shape (scales to 100 TB of events):
- per-(entity, day) argmax — partial-aggregatable ``max_by``, one shuffle;
- the calendar grid is ``sequence() + explode`` over the DISTINCT entity
  list — |entities| × |days| rows, generated, never stored;
- grid ⋈ daily is an equi-join on (entity, day) — hash-uniform;
- the fill is ``last(_, ignorenulls=True)`` over a per-entity window —
  one sort per entity partition, state is a single value.  Windows are
  per-ENTITY (bounded, uniform), not per-term/global — no skew hazard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def daily_latest(
    df: DataFrame,
    entity: str,
    ts_col: str,
    value_col: str,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Newest observation per (entity, calendar day) — max_by argmax."""
    order = F.struct(
        F.col(ts_col), *[F.col(c) for c in (tiebreak or [])]
    )
    return (
        df.withColumn("day", F.col(ts_col).cast("date"))
        .groupBy(entity, "day")
        .agg(F.max_by(F.col(value_col), order).alias(value_col))
    )


def resample_ffill(
    df: DataFrame,
    entity: str,
    ts_col: str,
    value_col: str,
    start: str,
    end: str,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """One row per (entity, day) over [start, end]: the forward-filled
    newest observation and ``days_since_obs`` staleness (null before an
    entity's first observation)."""
    daily = daily_latest(df, entity, ts_col, value_col, tiebreak=tiebreak)
    days = F.explode(
        F.sequence(
            F.lit(start).cast("date"),
            F.lit(end).cast("date"),
            F.expr("interval 1 day"),
        )
    ).alias("day")
    grid = df.select(entity).distinct().select(entity, days)
    j = grid.join(daily, [entity, "day"], "left").withColumn(
        "obs_day", F.when(F.col(value_col).isNotNull(), F.col("day"))
    )
    w = (
        Window.partitionBy(entity)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = j.select(
        F.col(entity),
        F.col("day"),
        F.last(value_col, ignorenulls=True).over(w).alias(value_col),
        F.last("obs_day", ignorenulls=True).over(w).alias("__obs_day"),
    )
    return filled.withColumn(
        "days_since_obs", F.datediff(F.col("day"), F.col("__obs_day"))
    ).drop("__obs_day")
