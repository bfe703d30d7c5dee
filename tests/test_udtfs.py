"""UDTF surface tests (SURVEY.md §2.10): lateral table functions match the
codegen'd built-in paths they mirror."""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_store_healthcare_spark.functions.udtfs import register_udtfs
from feature_store_healthcare_spark.operators import dedup


def test_tokenize_udtf_matches_builtin_split(spark):
    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, "The  Quick brown fox"), (2, None), (3, "one")],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("udtf_docs")
    got = spark.sql(
        "SELECT d.doc_id, t.pos, t.token FROM udtf_docs d, LATERAL tokenize(d.text) t"
    ).collect()
    rows = {(r.doc_id, r.pos): r.token for r in got}
    assert rows == {(1, 0): "the", (1, 1): "quick", (1, 2): "brown", (1, 3): "fox", (3, 0): "one"}


def test_shingle_udtf_matches_dedup_shingles(spark):
    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "tiny")], "doc_id long, text string"
    )
    df.createOrReplaceTempView("udtf_docs2")
    got = spark.sql(
        "SELECT d.doc_id, s.shingle FROM udtf_docs2 d, LATERAL shingle(d.text, 2) s"
    )
    want = dedup.shingles(df, "doc_id", "text", n=2)
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
