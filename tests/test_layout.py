"""Z-order layout tests: the clustered write must let parquet skip most
files for point-gets on EITHER interleaved dimension — the online-table
locality story (SURVEY.md §4.3) measured, not assumed.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from feature_store_healthcare_spark.operators.layout import zorder_value, zorder_write


@pytest.fixture(scope="module")
def grid(spark):
    # 64×64 grid of (x, y) — every combination once, shuffled
    return (
        spark.range(64 * 64)
        .select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
            F.col("id").alias("payload"),
        )
        .orderBy(F.rand(seed=7))
    )


def _files_containing(path, col, lo, hi):
    """Files whose row-group min/max interval intersects [lo, hi] — what a
    reader must open for `col BETWEEN lo AND hi`."""
    hits = 0
    files = glob.glob(f"{path}/*.parquet")
    for f in files:
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            stats = {
                meta.row_group(rg).column(i).path_in_schema: meta.row_group(rg).column(i).statistics
                for i in range(meta.row_group(rg).num_columns)
            }
            s = stats[col]
            if s.min <= hi and s.max >= lo:
                hits += 1
                break
    return hits, len(files)


@pytest.mark.parametrize("strategy", ["approx", "exact"])
def test_zorder_skips_on_both_dims(spark, grid, tmp_path, strategy):
    path = str(tmp_path / f"zordered_{strategy}")
    zorder_write(grid, path, ["x", "y"], n_files=16, strategy=strategy)
    # a point-get slab on x must touch a minority of files; same for y —
    # a single-column sort could only achieve this for ONE of them
    x_hits, n = _files_containing(path, "x", 10, 13)
    y_hits, _ = _files_containing(path, "y", 10, 13)
    assert n >= 8
    assert x_hits <= n // 2, f"x slab hit {x_hits}/{n} files"
    assert y_hits <= n // 2, f"y slab hit {y_hits}/{n} files"
    # data intact
    back = spark.read.parquet(path)
    assert back.count() == 64 * 64
    assert back.agg(F.sum("payload")).first()[0] == grid.agg(F.sum("payload")).first()[0]


def test_single_sort_fails_one_dim(spark, grid, tmp_path):
    """Control: sorting by x alone clusters x but leaves y unclustered —
    every file spans the full y range."""
    path = str(tmp_path / "xsorted")
    (
        grid.repartitionByRange(16, F.col("x"))
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(path)
    )
    y_hits, n = _files_containing(path, "y", 10, 13)
    assert y_hits >= n - 1  # no skipping on the unsorted dim


@pytest.mark.parametrize("strategy", ["approx", "exact"])
def test_zorder_value_is_deterministic(spark, grid, strategy):
    a = sorted(
        r[0]
        for r in zorder_value(grid, ["x", "y"], strategy=strategy).select("__z").collect()
    )
    b = sorted(
        r[0]
        for r in zorder_value(grid, ["x", "y"], strategy=strategy).select("__z").collect()
    )
    assert a == b


def test_zorder_approx_plan_has_no_global_window(spark, grid):
    """The default (100 TB) path must not contain ANY window — the cut
    points come from one percentile_approx aggregate, and quantization is a
    codegen expression.  The exact path is the windowed control."""
    from feature_store_healthcare_spark import plans

    approx = plans.physical_plan(zorder_value(grid, ["x", "y"]), "simple")
    assert "Window" not in approx, approx
    exact = plans.physical_plan(
        zorder_value(grid, ["x", "y"], strategy="exact"), "simple"
    )
    assert "Window" in exact


def test_zorder_approx_handles_categorical_and_timestamp(spark):
    """Non-numeric dims route through hash/epoch proxies and still produce
    a full-range z-value per distinct combination."""
    df = spark.range(256).select(
        F.concat(F.lit("cat_"), (F.col("id") % 16).cast("string")).alias("c"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 3600).alias("t"),
    )
    z = zorder_value(df, ["c", "t"], bits=4)
    vals = [r[0] for r in z.select("__z").collect()]
    assert len(vals) == 256
    assert min(vals) >= 0 and len(set(vals)) > 16


def test_pit_join_on_bucketed_tables_is_shuffle_free(spark, sf_dir, tmp_path):
    """Flagship at scale: the PIT training join over spine/values both
    bucketed on the entity key runs with ZERO exchanges — the join zips
    bucket i with bucket i, and the argmax aggregate groups on (join keys
    + spine pk) so it reuses that partitioning instead of re-shuffling.
    Write once, join shuffle-free forever (SURVEY.md §4.2)."""
    from feature_store_healthcare_spark import plans
    from feature_store_healthcare_spark.operators.pit import point_in_time_join
    from feature_store_healthcare_spark.sources import load_table
    from feature_store_healthcare_spark.stores import read_table, write_bucketed

    ev = load_table(spark, sf_dir, "events")
    vals = ev.select("user_id", F.col("ts").alias("vts"), "value", "event_id")
    spine = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    write_bucketed(vals, "pit_vals_b", "user_id", 8, str(tmp_path / "v"), "user_id")
    write_bucketed(spine, "pit_spine_b", "user_id", 8, str(tmp_path / "s"), "user_id")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast join so the exchange count is meaningful
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        def pit(s, v):
            return point_in_time_join(
                s, v, on="user_id", spine_ts="ts", value_ts="vts",
                value_cols=["value"], spine_keys=["event_id"],
                tiebreak=["event_id"],
            )

        bucketed = pit(
            read_table(spark, "pit_spine_b"), read_table(spark, "pit_vals_b")
        )
        assert plans.count_exchanges(bucketed) == 0, plans.physical_plan(
            bucketed, "simple"
        )
        # unbucketed control: the join shuffles both sides, but the argmax
        # aggregate still reuses the join's partitioning (≤2 exchanges,
        # not 3)
        unbucketed = pit(spine, vals)
        assert 1 <= plans.count_exchanges(unbucketed) <= 2
        # identical results either way
        assert sorted(map(tuple, bucketed.collect())) == sorted(
            map(tuple, unbucketed.collect())
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS pit_vals_b")
        spark.sql("DROP TABLE IF EXISTS pit_spine_b")
