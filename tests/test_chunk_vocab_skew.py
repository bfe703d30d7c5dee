"""Tests for chunking.chunk_documents, text.vocab_coverage,
profile.key_skew_profile and dedup.burst_dedup (the ★ corpus/diagnostic
operators added in round 2)."""

from __future__ import annotations

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from feature_store_healthcare_spark.operators.chunking import chunk_documents
from feature_store_healthcare_spark.operators.dedup import burst_dedup, normalize_text
from feature_store_healthcare_spark.operators.profile import key_skew_profile
from feature_store_healthcare_spark.operators.text import vocab_coverage


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


class TestChunkDocuments:
    def test_chunk_counts_and_bounds(self, spark):
        texts = {
            "": 1,                       # empty -> one (empty) chunk
            "a b c": 1,                  # n <= chunk -> 1
            " ".join(["t"] * 8): 1,      # n == chunk exactly -> 1
            " ".join(["t"] * 9): 2,      # one token past -> 2
            " ".join(["t"] * 13): 2,     # 8 + stride(5) covers 13 -> 2
            " ".join(["t"] * 14): 3,
        }
        df = _docs(spark, list(texts))
        out = chunk_documents(df, "doc_id", "text", chunk_tokens=8, overlap_tokens=3)
        got = {
            r["doc_id"]: r["n"]
            for r in out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
        }
        want = {i: c for i, (_, c) in enumerate(texts.items())}
        assert got == want
        # every chunk non-empty, token_start strides, last chunk may be short
        for r in out.collect():
            assert r["chunk_token_count"] >= 1
            assert r["token_start"] == r["chunk_idx"] * 5
            assert len(r["chunk_text"].split(" ")) == r["chunk_token_count"] or (
                r["chunk_text"] == "" and r["chunk_token_count"] == 1
            )

    def test_reconstruction_invariant(self, spark, sf_dir):
        """Dropping each chunk's leading overlap (except chunk 0) and
        concatenating restores the normalized document."""
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
        chunks = chunk_documents(docs, "doc_id", "text", 16, 4)
        tail = F.when(
            F.col("chunk_idx") == 0, F.col("chunk_text")
        ).otherwise(
            F.array_join(
                F.slice(F.split(F.col("chunk_text"), " "), 5, 16), " "
            )
        )
        rebuilt = (
            chunks.withColumn("piece", tail)
            .groupBy("doc_id")
            .agg(
                F.array_join(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_idx", "piece"))
                    ).getField("piece"),
                    " ",
                ).alias("rebuilt")
            )
        )
        joined = (
            docs.select("doc_id", normalize_text("text").alias("norm"))
            .join(rebuilt, "doc_id")
            .where(F.col("norm") != F.col("rebuilt"))
        )
        assert joined.count() == 0


class TestVocabCoverage:
    def test_tiny_corpus_exact(self, spark):
        df = _docs(spark, ["a a b", "a c", "b"])
        out = {r["token"]: r for r in vocab_coverage(df, "text", top_k=10).collect()}
        assert out["a"]["rank"] == 1 and out["a"]["cnt"] == 3
        # tie between b(2) and c(1): b has 2, c 1
        assert out["b"]["rank"] == 2 and out["b"]["cnt"] == 2
        assert out["c"]["rank"] == 3
        assert out["a"]["frac"] == round(3 / 6, 6)
        assert out["c"]["cum_frac"] == 1.0

    def test_cum_monotone_and_rank_ties(self, spark):
        df = _docs(spark, ["x y", "y x", "z z"])
        rows = sorted(
            vocab_coverage(df, "text", top_k=10).collect(), key=lambda r: r["rank"]
        )
        # all three tokens have cnt=2 -> lexicographic rank order
        assert [r["token"] for r in rows] == ["x", "y", "z"]
        cums = [r["cum_frac"] for r in rows]
        assert cums == sorted(cums) and cums[-1] == 1.0


class TestKeySkewProfile:
    def test_uniform_keys(self, spark):
        df = spark.createDataFrame([Row(k=i % 4) for i in range(40)])
        r = key_skew_profile(df, "k").collect()[0]
        assert r["n_rows"] == 40 and r["n_keys"] == 4
        assert r["max_key_rows"] == 10
        assert r["top1_share_ppm"] == 250000
        assert r["entropy_norm"] == 1.0

    def test_single_key_and_skew(self, spark):
        one = spark.createDataFrame([Row(k=7)] * 5)
        r = key_skew_profile(one, "k").collect()[0]
        assert r["top1_share_ppm"] == 1000000 and r["entropy_norm"] is None
        skewed = spark.createDataFrame(
            [Row(k=0)] * 97 + [Row(k=1), Row(k=2), Row(k=3)]
        )
        s = key_skew_profile(skewed, "k").collect()[0]
        assert s["top1_share_ppm"] == 970000
        assert s["entropy_norm"] < 0.15
        # sanity vs closed form
        h = math.log(100) - (97 * math.log(97)) / 100
        assert abs(s["entropy_norm"] - h / math.log(4)) < 1e-6


class TestBurstDedup:
    def test_gap_filter(self, spark):
        rows = [
            # user 1, type a: 0s, 30s (drop), 59s (drop: 59-30 < 60... see note),
            # 130s (keep: 130-59 >= 60)
            Row(event_id=1, user_id=1, event_type="a", ts="2024-01-01 00:00:00"),
            Row(event_id=2, user_id=1, event_type="a", ts="2024-01-01 00:00:30"),
            Row(event_id=3, user_id=1, event_type="a", ts="2024-01-01 00:00:59"),
            Row(event_id=4, user_id=1, event_type="a", ts="2024-01-01 00:02:10"),
            # other type: independent stream
            Row(event_id=5, user_id=1, event_type="b", ts="2024-01-01 00:00:10"),
            # other user
            Row(event_id=6, user_id=2, event_type="a", ts="2024-01-01 00:00:20"),
        ]
        df = spark.createDataFrame(rows).withColumn(
            "ts", F.col("ts").cast("timestamp_ntz")
        )
        kept = {
            r["event_id"]
            for r in burst_dedup(
                df, ["user_id", "event_type"], "ts", 60, tie_col="event_id"
            ).collect()
        }
        # gap is measured vs the previous RAW event (kept or not):
        # e2 30s after e1 -> drop; e3 29s after e2 -> drop; e4 71s after e3 -> keep
        assert kept == {1, 4, 5, 6}

    def test_tie_break_deterministic(self, spark):
        rows = [
            Row(event_id=2, user_id=1, event_type="a", ts="2024-01-01 00:00:00"),
            Row(event_id=1, user_id=1, event_type="a", ts="2024-01-01 00:00:00"),
        ]
        df = spark.createDataFrame(rows).withColumn(
            "ts", F.col("ts").cast("timestamp_ntz")
        )
        kept = {
            r["event_id"]
            for r in burst_dedup(
                df, ["user_id", "event_type"], "ts", 60, tie_col="event_id"
            ).collect()
        }
        assert kept == {1}


class TestTemperatureSample:
    def test_t1_is_plain_rate(self, spark):
        """T=1 -> every domain gets the same acceptance rate target_frac."""
        from feature_store_healthcare_spark.operators.sampling import (
            temperature_sample,
        )

        rows = [Row(k=i, g="a" if i % 4 else "b") for i in range(400)]
        df = spark.createDataFrame(rows)
        out = temperature_sample(
            df, "g", "k", temperature=1.0, target_frac=0.5
        )
        rates = {r["g"]: r["accept_rate"] for r in out.select("g", "accept_rate").distinct().collect()}
        assert rates["a"] == rates["b"] == 0.5

    def test_high_temperature_upweights_small_domain(self, spark):
        from feature_store_healthcare_spark.operators.sampling import (
            temperature_sample,
        )

        rows = [Row(k=i, g="big" if i < 900 else "small") for i in range(1000)]
        df = spark.createDataFrame(rows)
        out = temperature_sample(df, "g", "k", temperature=2.0, target_frac=0.3)
        rates = {
            r["g"]: r["accept_rate"]
            for r in out.select("g", "accept_rate").distinct().collect()
        }
        # small domain must be accepted at a strictly higher rate
        assert rates["small"] > rates["big"]

    def test_deterministic_under_repartition(self, spark):
        from feature_store_healthcare_spark.operators.sampling import (
            temperature_sample,
        )

        rows = [Row(k=i, g=f"g{i % 5}") for i in range(500)]
        df = spark.createDataFrame(rows)
        a = {r["k"] for r in temperature_sample(df, "g", "k").collect()}
        b = {
            r["k"]
            for r in temperature_sample(df.repartition(13), "g", "k").collect()
        }
        assert a == b and a


class TestWeightedSample:
    def test_inclusion_odds_scale_with_weight(self, spark):
        from feature_store_healthcare_spark.operators.sampling import (
            weighted_sample,
        )

        # 100 heavy (w=50) + 900 light (w=1): heavy rows should dominate
        # a k=100 sample far beyond their 10% share
        rows = [Row(k=i, w=50 if i < 100 else 1) for i in range(1000)]
        df = spark.createDataFrame(rows)
        out = weighted_sample(df, "k", "w", k=100)
        heavy = out.where(F.col("w") == 50).count()
        assert heavy > 55  # E[heavy] ≈ 85 under ES; uniform would be ~10

    def test_deterministic_and_weight_zero_excluded(self, spark):
        from feature_store_healthcare_spark.operators.sampling import (
            weighted_sample,
        )

        rows = [Row(k=i, w=(i % 5)) for i in range(200)]
        df = spark.createDataFrame(rows)
        a = sorted(r["k"] for r in weighted_sample(df, "k", "w", k=30).collect())
        b = sorted(
            r["k"]
            for r in weighted_sample(df.repartition(9), "k", "w", k=30).collect()
        )
        assert a == b and len(a) == 30
        assert all(k % 5 != 0 for k in a)  # w=0 rows never sampled
