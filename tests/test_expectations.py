"""Declarative data-quality expectations."""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_store_healthcare_spark.operators import expectations as ex


def _report_map(df):
    return {r.check: r for r in df.collect()}


def test_row_checks_single_pass(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "A"), (2, None, "B"), (None, 99.0, "A"), (4, 5.0, None)],
        "id int, v double, flag string",
    )
    rep = _report_map(
        ex.row_checks_report(
            df,
            [
                ex.not_null("id"),
                ex.in_range("v", 0, 50),
                ex.accepted_values("flag", ["A", "B"]),
                ex.satisfies("v_times_two_small", F.col("v") * 2 < 30),
            ],
        )
    )
    assert rep["not_null(id)"].n_violations == 1
    # null v and v=99 both violate the range
    assert rep["in_range(v,0,50)"].n_violations == 2
    assert rep["accepted_values(flag)"].n_violations == 1
    # v=99 fails the predicate; the NULL predicate row counts as a
    # violation too (coalesce to false); v=10 and v=5 pass
    assert rep["v_times_two_small"].n_violations == 2
    assert all(r.n_rows == 4 for r in rep.values())
    assert not rep["not_null(id)"].passed


def test_uniqueness_and_referential(spark):
    df = spark.createDataFrame([(1,), (1,), (2,)], "k int")
    rep = _report_map(ex.uniqueness_report(df, ["k"]))
    assert rep["unique(k)"].n_violations == 1 and not rep["unique(k)"].passed

    ref = spark.createDataFrame([(1,), (2,)], "rk int")
    child = spark.createDataFrame([(1,), (3,), (None,)], "k int")
    rep = _report_map(ex.referential_report(child, "k", ref, "rk"))
    r = rep["references(k)"]
    # 3 has no parent; NULL key is an orphan too
    assert r.n_violations == 2 and r.n_rows == 3 and not r.passed


def test_suite_all_green_on_clean_data(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 6.0)], "id int, v double")
    ref = spark.createDataFrame([(1,), (2,)], "rid int")
    out = ex.expectation_suite(
        df,
        [ex.not_null("id"), ex.in_range("v", 0, 10)],
        unique=[["id"]],
        references=[("id", ref, "rid")],
    ).collect()
    assert len(out) == 4
    assert all(r.passed for r in out)
