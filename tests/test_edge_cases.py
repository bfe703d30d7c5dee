"""Degenerate-input robustness: empty tables, single rows, k > corpus —
the shapes a long-running 100 TB pipeline hits at partition boundaries and
cold starts, where a driver-side assumption (first(), collect()[0], divide
by count) would crash or silently mis-answer."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from feature_store_healthcare_spark.operators import dedup, similarity
from feature_store_healthcare_spark.operators.pit import latest_per_key, point_in_time_join


def _spine(spark, rows):
    return spark.createDataFrame(rows, "entity_id string, ts timestamp_ntz")


def _vals(spark, rows):
    return spark.createDataFrame(rows, "entity_id string, v double, event_ts timestamp_ntz")


def test_pit_join_empty_values_preserves_spine(spark):
    spine = _spine(spark, [("e1", datetime(2024, 1, 2))])
    vals = _vals(spark, []).limit(0)
    out = point_in_time_join(spine, vals, on="entity_id", spine_ts="ts", value_ts="event_ts").collect()
    assert len(out) == 1
    assert out[0].v is None and out[0].v__timestamp is None


def test_pit_join_empty_spine(spark):
    spine = _spine(spark, [])
    vals = _vals(spark, [("e1", 1.0, datetime(2024, 1, 1))])
    assert point_in_time_join(spine, vals, on="entity_id", spine_ts="ts", value_ts="event_ts").count() == 0


def test_latest_per_key_empty(spark):
    vals = _vals(spark, [])
    assert latest_per_key(vals, keys=["entity_id"], ts_col="event_ts").count() == 0


def test_cosine_topk_k_exceeds_corpus(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.5, 0.5])], "vec_id long, embedding array<double>"
    )
    q = df.where(F.col("vec_id") == 1).select(F.col("vec_id").alias("query_id"), "embedding")
    out = similarity.cosine_topk(q, df, k=10, dim=2).collect()
    assert len(out) == 1  # only the one non-self corpus vector exists


def test_jaccard_single_doc_no_pairs(spark):
    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    assert dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=2, threshold=0.0).count() == 0


def test_simhash_pairs_empty_corpus(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    assert dedup.simhash_pairs(docs, "doc_id", "text").count() == 0


def test_exact_dedup_keep_min_all_duplicates(spark):
    df = spark.createDataFrame(
        [(3, "same"), (1, "same"), (2, "same")], "id long, text string"
    )
    out = dedup.exact_dedup_keep_min(df, ["text"], "id").collect()
    assert len(out) == 1 and out[0].id == 1


def test_minhash_empty_text(spark):
    docs = spark.createDataFrame([(1, ""), (2, "   ")], "doc_id long, text string")
    sigs = dedup.minhash_signatures(docs, "doc_id", "text", n=3, num_hashes=4)
    # empty/whitespace docs still produce one signature row each (the
    # single empty shingle), never a crash or a dropped doc
    assert sigs.count() == 2


def test_simhash_zero_width_chunks_rejected(spark):
    """A Hamming budget needing more chunks than signature bits would give
    zero-width chunks — every pair collides, an accidental cross join.
    Must raise, not silently go quadratic."""
    import pytest as _pytest

    from feature_store_healthcare_spark.operators import dedup as _dedup

    docs = spark.createDataFrame([(1, "a b"), (2, "c d")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="zero-width"):
        _dedup.simhash_pairs(docs, "doc_id", "text", bits=32, max_hamming=40)
