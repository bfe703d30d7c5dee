"""Scale rehearsal: blow sf0.1 up 20-100x IN-ENGINE, persist it as real
parquet, and run the heaviest headline queries against it — converting the
"designed for 100 TB" plan claims into *measured* evidence (wall-time
scaling vs data scaling, shuffle volumes, no driver blow-up).

Usage:
    python tools/scale_rehearsal.py [--build-only] [--skip-build]

Blow-up design (cardinality really grows — not just row duplication):
  - every table is crossJoined with a broadcast replica index ``__r`` and
    its keys are offset by ``r * (max_key + 1)``, so primary keys stay
    unique and FK integrity holds within each replica (the same way TPC-H
    dbgen scales);
  - events x100 (~10M rows, the stream fact), lineitem/orders/dims x20,
    documents x20 (~100k docs), embeddings x50 (~100k vectors);
  - document text gains a per-replica suffix token and embedding vectors a
    tiny per-(replica, component) perturbation, so dedup keeps its real
    near-dup structure and ANN doesn't degenerate into all-ties;
  - events timestamps shift by ``r`` seconds so per-key orderings stay
    well-defined at 100x density.

Metrics: wall time (2 runs, min) at 1x and at the blow-up, plus shuffle
read/write bytes and peak single-stage shuffle write from the Spark UI
REST API (the session here enables the UI; the tuned test session keeps
it off).  Results land in SCALE_REHEARSAL.json and the marked section of
SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from feature_store_healthcare_spark import queries as catalog  # noqa: E402
from feature_store_healthcare_spark.session import RUNTIME_CONFS, configure  # noqa: E402
from feature_store_healthcare_spark.sources import load_table  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(REPO, ".scale", "sf0.1x")
MARKER = os.path.join(OUT, "_BUILT")

#: --deep: events-only blow-up at x1000 (~100M rows).  One order of
#: magnitude past the main rehearsal for the feature-store core, whose
#: queries touch only the events fact — the dims are not written, so a
#: query that silently depended on one would fail loudly here.
DEEP_OUT = os.path.join(REPO, ".scale", "sf0.1deep")
DEEP_MARKER = os.path.join(DEEP_OUT, "_BUILT")
DEEP_EVENTS_FACTOR = 1000

#: replica counts per table (region/nation are true dims, copied as-is)
FACTORS = {
    "customer": 20,
    "supplier": 20,
    "part": 20,
    "orders": 20,
    "lineitem": 20,
    "events": 100,
    "documents": 20,
    "embeddings": 50,
}

#: primary/foreign keys to offset per replica: table -> {col: offset_base}
#: offset bases are max_key+1 of the REFERENCED table at sf0.1
OFFS = {"cust": 15_000, "supp": 1_000, "part": 20_000, "order": 150_000,
        "event": 100_000, "user": 1_500, "doc": 5_000, "vec": 2_000}

REHEARSAL = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "eav_latest_per_key",
    "pit_training_join",
    "pit_training_join_bucketed",
    "pivot_event_type_stats",
    "window_rank_orders",
    "tumbling_window_counts",
    "sessionize_events",
    "sessionize_events_bucketed",
    "json_extract_events",
    "cdc_apply_changes",
    "cdc_apply_changes_bucketed",
    "feature_drift_psi",
    "online_kv_point_get",
    "streaming_tumbling_rollup",
    "pagerank_supplier_parts",
    "dedup_exact_fingerprint",
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_shuffled",
    "dedup_minhash_lsh_stored",
    "simhash_pairs_prod64",
    "dedup_ngram_jaccard",
    "dedup_cluster_survivors",
    "dedup_incremental_minhash",
    "embedding_topk_bruteforce",
    "embedding_ivf_topk",
    "embedding_ivf_stored",
    "ivf_index_append",
    "bm25_lexical_topk",
    "hybrid_rrf_retrieval",
    # round-8: the stored-index hybrids next to the live form — ×20 docs /
    # ×50 embeddings is the one blow-up with BOTH corpora present
    "hybrid_rrf_stored",
    "hybrid_rrf_ivf_stored",
    "multimodal_image_features",
    # round-12: the REAL codec paths at ×20 docs — encode+decode are
    # per-row Arrow kernels with NO shuffle (synthesize → decode chains
    # two mapInPandas inside one stage), so the ratio should track the
    # document count linearly and shuffle volume should stay ~zero
    "multimodal_real_decode",
    "multimodal_audio_decode",
    "multimodal_video_decode",
    "phi_scrub_notes",
    "zorder_write_lineitem",
    # round-9 VERDICT #6: the iterative BPE trainer's 100 TB claim — loop
    # cost decoupled from corpus bytes after the round-0 vocab
    # compression — measured instead of argued: the ×20-docs ratio should
    # sit far below 20× because only the one corpus scan scales
    "bpe_train_merges",
    # round-10 additions: the learned quality filter (3 single-row
    # aggregate passes over a checkpointed projection — per-step cost is
    # one column-pruned scan) and the mix planner (one scan + broadcasts)
    "logreg_weak_label_fit",
    "logreg_quality_filter",
    "source_mix_plan",
    # round-11: DSIR importance weights — the ×20 ratio should track the
    # two tokenize passes + one (doc,dim) shuffle; the distribution
    # tables stay ≤256 rows at any scale
    "dsir_importance_resample",
    # ... and the stored-distribution incremental twin: the probe is a
    # delta-sized pass + a ≤256·batches-row distribution read (index
    # bootstrap amortized like the other stored entries)
    "dsir_incremental_stored",
    # round-13 (VERDICT ask #3): linkage at ×20 customer — the ×20 build
    # replicates c_name VERBATIM per replica, so every block densifies
    # ×20 and probes ×20: in-block levenshtein pairs grow ×400, the
    # worst-case block-skew bracket (cost is Σ|block|·|probes in block|;
    # the blocking-key width is the caller's dial)
    "record_linkage_best_match",
    # round-13 (VERDICT ask #5): stored-PCA probe flat-vs-live at ×50
    # embeddings — live refits Gram+eigh+projection per call, the stored
    # probes pay only the projected scan (catalog expression shape and
    # the BLAS serve twin, 1:1 with embedding_pca_topk's 100-query batch)
    "embedding_pca_topk",
    "embedding_pca_stored",
    "embedding_pca_stored_blas",
    # ... and the IVF BLAS serve twin (rank-identical to the expression
    # probe at every nprobe, test-pinned) — same 1:1 query shape as
    # embedding_ivf_stored above
    "embedding_ivf_stored_blas",
]

#: --deep-docs: documents-only blow-up at x200 (1M docs).  Unlike the main
#: build's uniform near-dup replication (which at x200 would make EVERY doc
#: a member of a 200-way near-dup cluster — ~1e8 candidate pairs, a
#: measurement of output size rather than engine scaling), this corpus has
#: a realistic shape: replicas 0-19 keep the big build's suffix-token
#: near-dup structure (10% of the corpus in 20-way clusters, the same
#: structure the x20 rehearsal measured), replicas 20-199 get ~120 extra
#: hash-derived tokens so their shingle Jaccard vs the base drops to ~0.3
#: — below the 4-row-band collision range — and they behave as the 90%
#: distinct long tail a production corpus has.
DEEPDOCS_OUT = os.path.join(REPO, ".scale", "sf0.1deepdocs")
DEEPDOCS_MARKER = os.path.join(DEEPDOCS_OUT, "_BUILT")
DEEPDOCS_FACTOR = 200

#: --ann-recall hostile bracket (round-9 VERDICT #1): the main ×50
#: embeddings build is 49 lightly-perturbed replicas per base vector —
#: replica clusters co-assign to the same inverted list, an ANN-FRIENDLY
#: structure that flatters IVF recall.  This embeddings-only ×50 corpus is
#: the opposite bracket: replica 0 keeps the base vector (so the query
#: batch is unchanged), replicas 1-24 are DIFFUSE perturbed-cluster
#: vectors (0.5·base + hash-uniform noise whose per-component std ≈ the
#: corpus spread — parent-child cosine ≈ 0.5, clusters ~10× wider than
#: the friendly build's ±0.0005), and replicas 25-49 are entirely fresh
#: hash-random vectors with no parent at all.  A real corpus sits between
#: the two brackets.
HOSTILE_OUT = os.path.join(REPO, ".scale", "sf0.1hostile")
HOSTILE_MARKER = os.path.join(HOSTILE_OUT, "_BUILT")

#: the --deep-docs suite: every entry reads ONLY the documents table
DEEPDOCS = [
    "dedup_exact_fingerprint",
    # round-8 A/B (VERDICT ask #4): the delta signature build two ways —
    # the shipping explode/partial-agg shape vs the fused Arrow kernel
    "minhash_build_explode",
    "minhash_build_arrow",
    "dedup_minhash_lsh_fast",
    "dedup_minhash_lsh_stored",
    "dedup_incremental_minhash",
    "dedup_incremental_stored",
    "band_index_append",
    "bm25_lexical_topk",
    "doc_perplexity_quality",
    "text_quality_scores",
    # round-7: the stored-postings twins (catalog entries; first run pays
    # the one-time index build, min-of-2 reports the amortized probe)
    # next to their recompute-per-query live forms above/below
    "bm25_stored_postings",
    "perplexity_stored_postings",
    "bigram_lm_fluency",
    "bigram_lm_stored_postings",
    # round-10: the BPE train→encode round trip at 1M docs — the encode
    # half's rule folds are vocab-sized, but the per-doc reassembly
    # (collect_list over word occurrences) shuffles corpus tokens; this
    # row is that claim measured
    "bpe_encode_fertility",
    # round-11: DSIR at 1M docs — the live form's corpus shuffle is the
    # (doc,dim) tf table (linear in docs); the stored form's probe stays
    # delta-sized against the folded ≤256-row distributions
    "dsir_importance_resample",
    "dsir_incremental_stored",
    # NOT phi_scrub_notes: its notes are synthesized from the customer
    # table, which this documents-only blow-up does not write
]

#: the --deep suite: every entry reads ONLY the events fact
DEEP = [
    "eav_latest_per_key",
    "pit_training_join",
    "pit_training_join_bucketed",
    "pivot_event_type_stats",
    "tumbling_window_counts",
    "sessionize_events",
    "sessionize_events_bucketed",
    "json_extract_events",
    "cdc_apply_changes",
    "cdc_apply_changes_bucketed",
    "feature_drift_psi",
    "online_kv_point_get",
    "streaming_tumbling_rollup",
]


# --------------------------------------------------------------------------
# Rehearsal-only runners: the de-broadcast / bucketed scale paths that the
# catalog's oracle-pinned entries deliberately don't exercise
# --------------------------------------------------------------------------

def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def _dir_label(sf_dir: str) -> str:
    """Which scale a runner is being timed at — keys the per-scale disk
    indexes (bucketed tables, KV exports, stream sources) so a deep run
    can never silently reuse a base-scale index."""
    p = os.path.abspath(sf_dir)
    if p == os.path.abspath(OUT):
        return "big"
    if p == os.path.abspath(DEEP_OUT):
        return "deep"
    if p == os.path.abspath(DEEPDOCS_OUT):
        return "deepdocs"
    return "base"


# dedup_minhash_lsh_shuffled needs no runner here: it became a registered
# catalog query (same DuckDB oracle as the broadcast entry), and the
# lookup chain resolves catalog names first.


def _simhash_prod64(spark, sf_dir):
    """Production simhash: 64-bit xxhash64 signatures, wide pigeonhole
    chunks, auto join strategy — the sub-quadratic-candidates form."""
    from feature_store_healthcare_spark.operators import dedup

    return dedup.simhash_pairs(
        _docs(spark, sf_dir), "doc_id", "text", bits=64, max_hamming=3
    )


def _pit_bucketed(spark, sf_dir):
    """The zero-exchange PIT training join over bucketed spine/values
    tables — same query as the catalog's pit_training_join, but both sides
    pre-bucketed on the entity key via stores.write_bucketed.  The bucket
    write is a one-time index build: the first timed run pays it, the
    second reuses the stored tables, and run_suite's min() reports the
    steady-state join cost (exactly how a 100 TB run amortizes layout)."""
    from pyspark.sql import functions as FF

    from feature_store_healthcare_spark.operators.pit import point_in_time_join
    from feature_store_healthcare_spark.stores import read_table, write_bucketed

    label = _dir_label(sf_dir)
    sp_t, va_t = f"reh_pit_spine_{label}", f"reh_pit_vals_{label}"
    # check BOTH tables: a crash between the two writes must not leave a
    # half-built index that later runs trust
    if not (spark.catalog.tableExists(sp_t) and spark.catalog.tableExists(va_t)):
        ev = load_table(spark, sf_dir, "events")
        spine = ev.where(FF.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts"
        )
        vals = ev.where(FF.col("event_type") == "click").select(
            "user_id", FF.col("value").alias("click_value"), "ts", "event_id"
        )
        write_bucketed(
            spine, sp_t, "user_id", 32,
            os.path.join(REPO, ".scale", "buckets", sp_t),
        )
        write_bucketed(
            vals, va_t, "user_id", 32,
            os.path.join(REPO, ".scale", "buckets", va_t),
        )
    return point_in_time_join(
        read_table(spark, sp_t), read_table(spark, va_t),
        on="user_id", spine_ts="ts", value_ts="ts",
        value_cols=["click_value"], tiebreak=["event_id"],
        spine_keys=["event_id"],
    )


def _online_kv_point_get(spark, sf_dir):
    """The serving SLA claim, measured: export the latest-per-user table to
    the md5-hash-bucketed KV layout (one-time index build, paid by the
    first timed run and amortized away by min-of-2), then POINT-GET one
    entity.  The claim under test is that point-get cost is independent of
    table size — the client computes the bucket in plain Python and the
    scan prunes to one directory before any I/O."""
    from pyspark.sql import functions as FF

    from feature_store_healthcare_spark import stores
    from feature_store_healthcare_spark.operators.pit import latest_per_key

    label = _dir_label(sf_dir)
    path = os.path.join(REPO, ".scale", "kv", label)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        ev = load_table(spark, sf_dir, "events")
        latest = latest_per_key(ev, ["user_id"], "ts", tiebreak=["event_id"]).select(
            FF.lit("user").alias("entity_type"),
            FF.col("user_id").cast("string").alias("entity_id"),
            "value",
            "ts",
        )
        stores.export_online_kv(latest, path)
    return stores.kv_point_get(spark, path, "user", "42")


def _streaming_tumbling(spark, sf_dir):
    """Structured Streaming throughput at scale: run the watermarked
    tumbling-window rollup over the events table as an 8-micro-batch
    availableNow stream (file source, parquet sink).  Checkpoint/output
    are wiped per run so every timing is a FULL reprocess — this measures
    per-event stream cost at 1x vs 100x, not checkpoint skip.  The 1x
    source is pre-split into 16 files once so both scales progress through
    the same number of micro-batches (watermarks only advance between
    batches; a single-file source would emit nothing in append mode)."""
    import shutil

    from feature_store_healthcare_spark.streaming import pipeline

    label = _dir_label(sf_dir)
    base = os.path.join(REPO, ".scale", "stream", label)
    if label == "base":
        src = os.path.join(base, "src")
        if not os.path.exists(os.path.join(src, "_SUCCESS")):
            load_table(spark, sf_dir, "events").repartition(16).write.mode(
                "overwrite"
            ).parquet(src)
        per_trigger = 2  # 16 files / 2 = 8 micro-batches
    else:
        # big is written as 64 files, deep as 128 — 8 micro-batches both
        src = os.path.join(sf_dir, "events.parquet")
        per_trigger = 8 if label == "big" else 16
    out = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    for d in (out, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", per_trigger)
        .parquet(src)
        # watermarks require TIMESTAMP; session TZ is pinned UTC so the
        # cast from the parquet ntz column is an identity
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = pipeline.tumbling_window_features(stream)
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


def _lsh_stored_bands(spark, sf_dir):
    """The steady-state LSH query cost: candidate pairs from a STORED
    band-table index (write_bucketed on bkey — built once, reused by
    every arrival batch / re-dedup run), vs the full-suite entries that
    deliberately re-pay the 16-way signature build per timed run.  The
    first timed run pays the one-time index write and min-of-2 reports
    the amortized bucketed self-join alone — the lsh analog of
    pit_training_join_bucketed."""
    from feature_store_healthcare_spark.operators import dedup
    from feature_store_healthcare_spark.stores import read_table, write_bucketed

    label = _dir_label(sf_dir)
    # table name versioned at each hash-family boundary ("a" = round-8
    # xxhash→arrow, "a2" = round-9 arrow-v1→arrow-v2 signed-min fix): a
    # stale other-family band dir must never be mixed with (probes
    # silently return zero pairs) or appended into (marker raises)
    t = f"reh_lsh_bands_a2_{label}"
    if not spark.catalog.tableExists(t):
        docs = _docs(spark, sf_dir)
        sig = dedup.minhash_signatures_arrow(docs, "doc_id", "text", n=3, num_hashes=16)
        banded = dedup._banded_signatures(sig, "doc_id", 16, 4)
        write_bucketed(
            banded, t, "bkey", 32, os.path.join(REPO, ".scale", "buckets", t)
        )
    return dedup.lsh_pairs_from_bands(read_table(spark, t), "doc_id")


def _incremental_stored(spark, sf_dir):
    """The steady-state daily dedup cost: today's 20% delta batch
    signature-built per run, probed against the STORED corpus band index
    (write_bucketed, built once) — vs the catalog entry that re-derives
    both sides per run.  Per-batch cost is O(|delta| signatures + probe);
    the corpus text is never re-read."""
    from pyspark.sql import functions as FF

    from feature_store_healthcare_spark.operators import dedup
    from feature_store_healthcare_spark.stores import read_table, write_bucketed

    label = _dir_label(sf_dir)
    t = f"reh_inc_bands_a2_{label}"  # "a2": arrow-v2 (round-9 boundary)
    docs = _docs(spark, sf_dir)
    if not spark.catalog.tableExists(t):
        corpus = docs.where(FF.col("doc_id") % 5 != 0)
        banded = dedup._banded_signatures(
            dedup.minhash_signatures_arrow(corpus, "doc_id", "text", n=3, num_hashes=16),
            "doc_id", 16, 4,
        )
        write_bucketed(
            banded, t, "bkey", 32, os.path.join(REPO, ".scale", "buckets", t)
        )
    new = docs.where(FF.col("doc_id") % 5 == 0)
    return dedup.minhash_lsh_pairs_cross(
        new, None, "doc_id", "text", n=3, num_hashes=16, bands=4,
        corpus_bands=read_table(spark, t),
    )


def _minhash_build_explode(spark, sf_dir):
    """A/B baseline (round-7 VERDICT ask #4): the shipping signature build
    — shingle explode + 16-way min partial-agg groupBy — over the 20%
    delta batch that dominates band_index_append /
    dedup_incremental_stored."""
    from pyspark.sql import functions as FF

    from feature_store_healthcare_spark.operators import dedup

    delta = _docs(spark, sf_dir).where(FF.col("doc_id") % 5 == 0)
    return dedup.minhash_signatures(delta, "doc_id", "text", n=3, num_hashes=16)


def _minhash_build_arrow(spark, sf_dir):
    """A/B candidate: the fused mapInPandas numpy kernel
    (dedup.minhash_signatures_arrow) — no row explosion, no groupBy;
    token-hash once, polynomial n-gram combine, per-seed splitmix64 mix,
    reduceat minima.  Different hash family (same estimator properties);
    ship as the fast path only if this row beats the explode row."""
    from pyspark.sql import functions as FF

    from feature_store_healthcare_spark.operators import dedup

    delta = _docs(spark, sf_dir).where(FF.col("doc_id") % 5 == 0)
    return dedup.minhash_signatures_arrow(delta, "doc_id", "text", n=3, num_hashes=16)


def _band_index_append(spark, sf_dir):
    """The closing step of the daily incremental loop, measured: append a
    20% delta's banded signatures into the stored corpus band index via
    dedup.append_band_index (probe → dedup → admit → APPEND).  First timed
    run bootstraps the 80% corpus index through the same function and
    min-of-2 amortizes it away, so the reported cost is one delta append:
    the delta's own signature build plus a bucketed write of
    |delta|·bands fixed-width rows — the existing index is never read.
    Returns a 1-row frame; the work is the eager write inside the run."""
    from pyspark.sql import functions as FF

    from feature_store_healthcare_spark.operators import dedup

    label = _dir_label(sf_dir)
    t = f"reh_append_bands_a2_{label}"  # "a2": arrow-v2 (round-9 boundary)
    path = os.path.join(REPO, ".scale", "buckets", t)
    docs = _docs(spark, sf_dir)
    if not spark.catalog.tableExists(t):
        dedup.append_band_index(
            docs.where(FF.col("doc_id") % 5 != 0), "doc_id", "text", t, path, 32
        )
    dedup.append_band_index(
        docs.where(FF.col("doc_id") % 5 == 0), "doc_id", "text", t, path, 32
    )
    return spark.range(1)


def _ivf_index_append(spark, sf_dir):
    """The ANN half of the incremental loop, measured: append a 20% delta
    of the embedding corpus into the stored IVF index via
    similarity.append_ivf_index.  First timed run bootstraps the 80%
    index through build_ivf_index and min-of-2 amortizes it away, so the
    reported cost is one delta append: load centroids (k rows), assign
    the delta (shuffle-free Arrow matmul map) and append into the
    ``__list=`` partition dirs — the existing lists are never read.
    Returns a 1-row frame; the work is the eager write inside the run."""
    from pyspark.sql import functions as FF

    from feature_store_healthcare_spark.operators import similarity

    label = _dir_label(sf_dir)
    path = os.path.join(REPO, ".scale", "ivf", f"reh_ivf_{label}")
    emb = load_table(spark, sf_dir, "embeddings")
    if not os.path.exists(f"{path}__centroids"):
        similarity.build_ivf_index(
            emb.where(FF.col("vec_id") % 5 != 0), path, n_centroids=64
        )
    similarity.append_ivf_index(emb.where(FF.col("vec_id") % 5 == 0), path)
    return spark.range(1)


def _events_bucketed(spark, sf_dir):
    """Shared per-scale bucketed events table (user_id, 32 buckets) — the
    one-time layout build behind the sessionize/CDC bucketed twins, built
    by whichever runner reaches it first and reused by the other (and by
    re-runs), exactly like _pit_bucketed's spine/values tables."""
    from feature_store_healthcare_spark.stores import read_table, write_bucketed

    label = _dir_label(sf_dir)
    t = f"reh_events_bkt_{label}"
    if not spark.catalog.tableExists(t):
        ev = load_table(spark, sf_dir, "events").select(
            "user_id", "ts", "event_id", "value", "event_type"
        )
        write_bucketed(
            ev, t, "user_id", 32, os.path.join(REPO, ".scale", "buckets", t)
        )
    return read_table(spark, t)


def _sessionize_bucketed(spark, sf_dir):
    """sessionize_events over user_id-bucketed events: the catalog entry's
    one hash shuffle (the x1000 deep rehearsal's 20.8x / 2.33 GB row) is
    the Exchange feeding the per-user window sort — a bucketed scan
    already satisfies ClusteredDistribution(user_id), and the downstream
    groupBy(user_id, session_id) is satisfied by the same partitioning
    (its keys are a superset), so the whole query runs with ZERO exchanges
    after the one-time layout build.  The per-bucket sort remains — that
    is CPU, not network, and is the part that scales with local data."""
    from pyspark.sql import functions as FF

    from feature_store_healthcare_spark.operators.resample import sessionize

    ev = _events_bucketed(spark, sf_dir)
    sessions = sessionize(ev, "user_id", "ts", gap=2 * 3600, tiebreak=["event_id"])
    return sessions.groupBy("user_id", "session_id").agg(
        FF.min("ts").alias("session_start"),
        FF.max("ts").alias("session_end"),
        FF.count("*").alias("n_events"),
        FF.sum(FF.col("value").cast("decimal(25,6)")).cast("double").alias("sum_value"),
    )


def _cdc_bucketed(spark, sf_dir):
    """cdc_apply_changes over user_id-bucketed events: the dominant cost in
    the x1000 deep rehearsal (12.7x / 1.79 GB) is the raw changelog's
    argmax shuffle on (user_id, event_type) — HashPartitioning(user_id)
    from the bucketed scan satisfies that clustering (subset rule), so
    BOTH the snapshot fold and the delta fold read shuffle-free.  Only the
    second fold's union (post-aggregation snapshot ~|keys| rows + delta
    winners) still exchanges — the surviving shuffle is key-count-, not
    event-count-, sized."""
    from pyspark.sql import functions as FF

    from feature_store_healthcare_spark.operators import cdc

    ev = _events_bucketed(spark, sf_dir)
    changelog = ev.select(
        "user_id", "event_type", "event_id", "ts", "value",
        FF.when(FF.col("value") < 1.0, FF.lit(cdc.DELETE_OP))
        .otherwise(FF.lit(cdc.UPSERT_OP))
        .alias("op"),
    )
    cut = "2024-01-16 00:00:00"
    keys = ["user_id", "event_type"]
    snapshot = cdc.materialize(
        changelog.where(FF.col("ts") < cut), keys, "ts", tiebreak=["event_id"]
    )
    final = cdc.apply_changes(
        snapshot,
        changelog.where(FF.col("ts") >= cut),
        keys,
        "ts",
        tiebreak=["event_id"],
    )
    return final.select("user_id", "event_type", "event_id", "ts", "value")


def _zorder_write_lineitem(spark, sf_dir):
    """The round-5 approx-quantile Z-order path at scale: cluster lineitem
    on (l_partkey, l_orderkey) and write.  The measured claim is the plan
    SHAPE — one percentile_approx aggregate for the cut points (no
    single-partition window anywhere) plus one range shuffle — so the
    write cost scales with data, not with a global sort."""
    import shutil

    from feature_store_healthcare_spark.operators.layout import zorder_write

    label = _dir_label(sf_dir)
    out = os.path.join(REPO, ".scale", "zorder", label)
    shutil.rmtree(out, ignore_errors=True)
    li = load_table(spark, sf_dir, "lineitem")
    zorder_write(li, out, ["l_partkey", "l_orderkey"], n_files=32)
    return spark.read.parquet(out)


REHEARSAL_EXTRA = {
    "minhash_build_explode": _minhash_build_explode,
    "minhash_build_arrow": _minhash_build_arrow,
    "simhash_pairs_prod64": _simhash_prod64,
    "zorder_write_lineitem": _zorder_write_lineitem,
    "dedup_minhash_lsh_stored": _lsh_stored_bands,
    "dedup_incremental_stored": _incremental_stored,
    "pit_training_join_bucketed": _pit_bucketed,
    "sessionize_events_bucketed": _sessionize_bucketed,
    "cdc_apply_changes_bucketed": _cdc_bucketed,
    "band_index_append": _band_index_append,
    "ivf_index_append": _ivf_index_append,
    "online_kv_point_get": _online_kv_point_get,
    "streaming_tumbling_rollup": _streaming_tumbling,
}

#: Entries whose runner amortizes a DISK index (bucketed tables, KV export)
#: or wipes its own state per run (streaming): these keep the session
#: cache across timing runs by design.  Everything else gets
#: spark.catalog.clearCache() before EVERY timed run, so persisted
#: intermediates (LSH band tables, CC edge lists, IVF centroids) are
#: recomputed inside the measured execution — otherwise Spark's
#: CacheManager substitutes run 1's never-unpersisted cache into run 2's
#: canonically-identical plan and the "measured" run skips its own
#: signature/index shuffles entirely (0.0 MB shuffle artifacts).
AMORTIZED = {
    "pit_training_join_bucketed",
    "sessionize_events_bucketed",
    "cdc_apply_changes_bucketed",
    "ivf_index_append",
    "online_kv_point_get",
    "streaming_tumbling_rollup",
    "dedup_minhash_lsh_stored",
    "bm25_stored_postings",
    "perplexity_stored_postings",
    "bigram_lm_stored_postings",
    "embedding_ivf_stored",
    "hybrid_rrf_stored",
    "hybrid_rrf_ivf_stored",
    "dsir_incremental_stored",
    # NOT amortized: dedup_incremental_stored and band_index_append.
    # Their DISK index bootstrap is amortized anyway (tableExists check,
    # unaffected by clearCache), but their dominant cost — the 200k-doc
    # delta's banded-signature build — lands in the round-7 unified
    # PlanCache, which run 2 (and the later suite entry processing the
    # same delta) would silently substitute, recording warm 2-4 s rows
    # where the standalone cost is ~37 s and hiding any regression in
    # the signature path.  clearCache before each timed run restores the
    # cold standalone measurement (the PlanCache detects the external
    # eviction and rebuilds); the warm loop-sharing number is real too
    # and documented as such in SCALE.md's footnotes, but the
    # machine-readable JSON carries the cold, regression-gateable cost.
}

#: timing-run count overrides (default 2, min taken).  The exact pairwise
#: Jaccard is deliberately kept in the suite as the documented quadratic
#: case (this corpus's bigram frequencies are uniformly hot — median
#: bigram appears in 285/5000 docs — so candidate pairs grow ~400x at 20x
#: replication and the stop-shingle guard is all-or-nothing here; the
#: production near-dup path on hot corpora is MinHash-LSH, measured in the
#: same suite).  One run records the blow-up honestly without spending an
#: hour re-proving it.
RUNS = {"dedup_ngram_jaccard": 1}


def rehearsal_spark() -> SparkSession:
    builder = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName("scale-rehearsal")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "true")  # REST metrics source
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return configure(builder.getOrCreate())


def _replicate(df, k: int):
    """crossJoin with a broadcast replica index 0..k-1."""
    r = df.sparkSession.range(k).withColumnRenamed("id", "__r")
    return df.crossJoin(F.broadcast(r))


def build(spark: SparkSession) -> None:
    os.makedirs(OUT, exist_ok=True)
    r = F.col("__r")

    def off(col, base):
        return (F.col(col) + r * base).alias(col)

    t0 = time.time()
    for name in ("region", "nation"):
        load_table(spark, SRC, name).write.mode("overwrite").parquet(
            os.path.join(OUT, f"{name}.parquet")
        )

    cust = _replicate(load_table(spark, SRC, "customer"), FACTORS["customer"])
    cust.select(
        off("c_custkey", OFFS["cust"]), "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment",
    ).write.mode("overwrite").parquet(os.path.join(OUT, "customer.parquet"))

    supp = _replicate(load_table(spark, SRC, "supplier"), FACTORS["supplier"])
    supp.select(
        off("s_suppkey", OFFS["supp"]),
        *[c for c in supp.columns if c not in ("s_suppkey", "__r")],
    ).write.mode("overwrite").parquet(os.path.join(OUT, "supplier.parquet"))

    part = _replicate(load_table(spark, SRC, "part"), FACTORS["part"])
    part.select(
        off("p_partkey", OFFS["part"]),
        *[c for c in part.columns if c not in ("p_partkey", "__r")],
    ).write.mode("overwrite").parquet(os.path.join(OUT, "part.parquet"))

    orders = _replicate(load_table(spark, SRC, "orders"), FACTORS["orders"])
    orders.select(
        off("o_orderkey", OFFS["order"]), off("o_custkey", OFFS["cust"]),
        "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
    ).write.mode("overwrite").parquet(os.path.join(OUT, "orders.parquet"))

    li = _replicate(load_table(spark, SRC, "lineitem"), FACTORS["lineitem"])
    li.select(
        off("l_orderkey", OFFS["order"]), off("l_partkey", OFFS["part"]),
        off("l_suppkey", OFFS["supp"]),
        *[c for c in li.columns
          if c not in ("l_orderkey", "l_partkey", "l_suppkey", "__r")],
    ).repartition(32).write.mode("overwrite").parquet(
        os.path.join(OUT, "lineitem.parquet")
    )

    ev = _replicate(load_table(spark, SRC, "events"), FACTORS["events"])
    ev.select(
        off("event_id", OFFS["event"]),
        # users grow 20x (matching customer); temporal density grows 5x;
        # the r-second shift keeps per-key event orderings well-defined
        (F.col("user_id") + (r % 20) * OFFS["user"]).alias("user_id"),
        (F.col("ts") + F.make_dt_interval(secs=r.cast("double"))).alias("ts"),
        "event_type", "value", "props",
    ).repartition(64).write.mode("overwrite").parquet(
        os.path.join(OUT, "events.parquet")
    )

    docs = _replicate(load_table(spark, SRC, "documents"), FACTORS["documents"])
    newtext = F.concat(F.col("text"), F.lit(" rep"), r.cast("string"))
    docs.select(
        off("doc_id", OFFS["doc"]), newtext.alias("text"), "lang", "source",
        F.length(newtext).alias("n_chars"),
    ).repartition(32).write.mode("overwrite").parquet(
        os.path.join(OUT, "documents.parquet")
    )

    emb = _replicate(load_table(spark, SRC, "embeddings"), FACTORS["embeddings"])
    perturbed = F.transform(
        "embedding",
        lambda x, i: x + ((r * 37 + i * 11) % 13 - 6).cast("float") * 0.0005,
    )
    emb.select(
        off("vec_id", OFFS["vec"]), perturbed.alias("embedding"), "label",
    ).repartition(32).write.mode("overwrite").parquet(
        os.path.join(OUT, "embeddings.parquet")
    )

    with open(MARKER, "w") as fh:
        fh.write(json.dumps({"src": SRC, "factors": FACTORS}))
    print(f"built {OUT} in {time.time() - t0:.1f}s", file=sys.stderr)


def build_hostile_embeddings(spark: SparkSession) -> None:
    """×50 embeddings with the HOSTILE (non-replica) structure documented
    at HOSTILE_OUT: base vectors kept, 24 diffuse perturbed-cluster
    children, 25 fresh hash-random vectors per base.  All noise is
    hash-derived from (vec_id, replica, component, salt) — deterministic
    across builds, no RNG state.  Noise is uniform in [-0.25, 0.25]
    (component std ≈ 0.144), the same order as the base corpus's
    per-component spread (≈0.125 for these unit-ish 64-dim vectors)."""
    os.makedirs(HOSTILE_OUT, exist_ok=True)
    t0 = time.time()
    emb = _replicate(load_table(spark, SRC, "embeddings"), FACTORS["embeddings"])
    r = F.col("__r")

    def noise(i, salt):
        h = F.xxhash64(F.col("vec_id"), r, i, F.lit(salt))
        return (F.pmod(h, F.lit(100000)).cast("double") / 100000.0 - 0.5) * 0.5

    blended = F.transform(
        "embedding", lambda x, i: (x * 0.5 + noise(i, 7)).cast("float")
    )
    fresh = F.transform("embedding", lambda x, i: noise(i, 13).cast("float"))
    emb.select(
        (F.col("vec_id") + r * OFFS["vec"]).alias("vec_id"),
        F.when(r == 0, F.col("embedding"))
        .when(r < 25, blended)
        .otherwise(fresh)
        .alias("embedding"),
        "label",
    ).repartition(32).write.mode("overwrite").parquet(
        os.path.join(HOSTILE_OUT, "embeddings.parquet")
    )
    with open(HOSTILE_MARKER, "w") as fh:
        fh.write(json.dumps({"src": SRC, "factor": FACTORS["embeddings"]}))
    print(f"built {HOSTILE_OUT} in {time.time() - t0:.1f}s", file=sys.stderr)


def build_deep(spark: SparkSession) -> None:
    """Events x1000 (~100M rows): user space grows 100x (10x per-user
    density), timestamps shift r seconds so per-key orderings stay
    well-defined, event_ids stay globally unique via replica offsets."""
    os.makedirs(DEEP_OUT, exist_ok=True)
    r = F.col("__r")
    t0 = time.time()
    ev = _replicate(load_table(spark, SRC, "events"), DEEP_EVENTS_FACTOR)
    ev.select(
        (F.col("event_id") + r * OFFS["event"]).alias("event_id"),
        (F.col("user_id") + (r % 100) * OFFS["user"]).alias("user_id"),
        (F.col("ts") + F.make_dt_interval(secs=r.cast("double"))).alias("ts"),
        "event_type", "value", "props",
    ).repartition(128).write.mode("overwrite").parquet(
        os.path.join(DEEP_OUT, "events.parquet")
    )
    with open(DEEP_MARKER, "w") as fh:
        fh.write(json.dumps({"src": SRC, "events_factor": DEEP_EVENTS_FACTOR}))
    print(f"built {DEEP_OUT} in {time.time() - t0:.1f}s", file=sys.stderr)


# --------------------------------------------------------------------------
# Spark UI REST metrics
# --------------------------------------------------------------------------

def build_deepdocs(spark: SparkSession) -> None:
    """Documents x200 (1M docs, ~10% in 20-way near-dup clusters — see the
    DEEPDOCS_OUT note for why the long tail is made distinct)."""
    os.makedirs(DEEPDOCS_OUT, exist_ok=True)
    r = F.col("__r")
    t0 = time.time()
    docs = _replicate(load_table(spark, SRC, "documents"), DEEPDOCS_FACTOR)
    near_dup = F.concat(F.col("text"), F.lit(" rep"), r.cast("string"))
    # ~120 hash-derived filler tokens from a 100k synthetic vocabulary:
    # cheap (one 64-bit hash per token), deterministic, and enough to push
    # shingle Jaccard vs the base text to ~0.3
    filler = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(120)),
            lambda i: F.concat(
                F.lit("w"),
                (F.abs(F.xxhash64(F.col("doc_id"), r, i)) % 100_000).cast("string"),
            ),
        ),
        " ",
    )
    distinct_tail = F.concat_ws(" ", F.col("text"), F.lit("rep"), filler)
    newtext = F.when(r < 20, near_dup).otherwise(distinct_tail)
    docs.select(
        (F.col("doc_id") + r * OFFS["doc"]).alias("doc_id"),
        newtext.alias("text"),
        "lang",
        "source",
        F.length(newtext).alias("n_chars"),
    ).repartition(64).write.mode("overwrite").parquet(
        os.path.join(DEEPDOCS_OUT, "documents.parquet")
    )
    with open(DEEPDOCS_MARKER, "w") as fh:
        fh.write(json.dumps({"src": SRC, "documents_factor": DEEPDOCS_FACTOR}))
    print(f"built {DEEPDOCS_OUT} in {time.time() - t0:.1f}s", file=sys.stderr)


def _stages(spark) -> dict[int, dict]:
    url = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{url}/api/v1/applications/{app}/stages?status=complete", timeout=10
        ) as resp:
            data = json.loads(resp.read())
        return {
            (s["stageId"], s["attemptId"]): s
            for s in data
        }
    except Exception:
        return {}


def _shuffle_delta(before: dict, after: dict) -> dict:
    new = [s for k, s in after.items() if k not in before]
    return {
        "shuffle_write_mb": round(
            sum(s.get("shuffleWriteBytes", 0) for s in new) / 1e6, 1
        ),
        "shuffle_read_mb": round(
            sum(s.get("shuffleReadBytes", 0) for s in new) / 1e6, 1
        ),
        "peak_stage_shuffle_write_mb": round(
            max((s.get("shuffleWriteBytes", 0) for s in new), default=0) / 1e6, 1
        ),
        "n_stages": len(new),
    }


def run_suite(
    spark: SparkSession, sf_dir: str, label: str, names: list[str] | None = None
) -> dict[str, dict]:
    from bench import EXTRA  # reuse the amortized-index runners

    out: dict[str, dict] = {}
    qs = catalog.queries()
    for name in names if names is not None else REHEARSAL:
        fn = qs.get(name) or EXTRA.get(name) or REHEARSAL_EXTRA.get(name)
        if fn is None:
            raise SystemExit(f"unknown rehearsal entry: {name!r}")
        times = []
        rows = 0
        before = after = {}
        n_runs = RUNS.get(name, 2)
        for i in range(n_runs):
            if name not in AMORTIZED:
                # cold per run: drop persisted intermediates so each timed
                # execution pays its own signature/index computation (see
                # the AMORTIZED note)
                spark.catalog.clearCache()
            # snapshot stage metrics around the LAST run only, so shuffle
            # bytes reflect one execution, not the sum of the timing runs
            if i == n_runs - 1:
                before = _stages(spark)
            t0 = time.time()
            df = fn(spark, sf_dir)
            rows = df.count()
            times.append(time.time() - t0)
            if i == n_runs - 1:
                after = _stages(spark)
        m = _shuffle_delta(before, after)
        m.update({"sec": round(min(times), 2), "rows": rows})
        out[name] = m
        print(f"{label:>6} {name:32s} {m['sec']:8.2f}s rows={rows:>9} "
              f"shW={m['shuffle_write_mb']}MB", file=sys.stderr)
    return out


def _recall_sets(rows, qattr: str, dattr: str) -> dict:
    out: dict = {}
    for r in rows:
        out.setdefault(getattr(r, qattr), set()).add(getattr(r, dattr))
    return out


def _hybrid_recall(
    spark: SparkSession,
    docs_df,
    emb_df,
    ivf_path: str,
    cents,
    n_queries: int = 50,
) -> dict:
    """recall@10 of the IVF-backed hybrid vs the exact hybrid over an
    ``n_queries`` batch (round-9 VERDICT #1: the catalog entry's 5-query
    batch was too thin to characterize recall at ×50).  Construction
    mirrors the catalog's `hybrid_rrf_ivf_stored` / `hybrid_rrf_retrieval`
    pair: BM25 lexical top-20 RRF-fused with a cosine top-20, k=10.  The
    lexical half — the 5 catalog query texts reused cyclically per query
    id — is the SAME DataFrame in both fusions, so every recall loss is
    attributable to the IVF half; the embedding half gives each query id
    a distinct vector (vec_id < n_queries = the base corpus vectors)."""
    from feature_store_healthcare_spark.operators import retrieval, similarity
    from feature_store_healthcare_spark.queries import _BM25_QUERY_SET

    qset = [
        (f"q{i}", _BM25_QUERY_SET[i % len(_BM25_QUERY_SET)][1])
        for i in range(n_queries)
    ]
    # materialized ONCE: the lexical half is shared by the exact fusion
    # and every timed approx iteration — without this, each timed probe
    # re-runs the full-corpus BM25 scan and warm_probe_sec measures the
    # lexical scan it claims to hold constant, not the IVF half
    bm = (
        retrieval.bm25_topk(docs_df, "doc_id", "text", qset, k=20)
        .select("query_id", "doc_id", "rank")
        .localCheckpoint(eager=True)
    )
    qbatch = emb_df.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def tag(df):
        return df.select(
            F.concat(F.lit("q"), F.col("query_id").cast("string")).alias(
                "query_id"
            ),
            F.col("vec_id").alias("doc_id"),
            "rank",
        )

    exact_cos = tag(similarity.cosine_topk(qbatch, emb_df, k=20))
    exact = retrieval.rrf_fuse([bm, exact_cos], "query_id", "doc_id", k=10)
    e = _recall_sets(exact.collect(), "query_id", "doc_id")

    times, a = [], {}
    for _ in range(2):
        t0 = time.time()
        approx_cos = tag(
            similarity.ivf_topk_from_index(
                spark, ivf_path, qbatch, k=20, nprobe=4, centroids=cents
            )
        )
        approx = retrieval.rrf_fuse(
            [bm, approx_cos], "query_id", "doc_id", k=10
        )
        a = _recall_sets(approx.collect(), "query_id", "doc_id")
        times.append(time.time() - t0)
    rec = [len(e[q] & a.get(q, set())) / len(e[q]) for q in e]
    return {
        "n_queries": len(e),
        "recall_at_10_mean": round(sum(rec) / len(rec), 3),
        "recall_at_10_min": round(min(rec), 3),
        "warm_probe_sec": round(min(times), 2),
    }


def run_ann_recall_hostile(spark: SparkSession) -> dict:
    """The hostile half of the round-9 VERDICT #1 bracket: the same two
    recall measurements as :func:`run_ann_recall`, over the ×50 corpus
    whose growth is perturbed-cluster + fresh-random vectors instead of
    near-replicas (see HOSTILE_OUT).  The lexical half of the hybrid
    reuses the main ×50 documents build — it is identical in the exact
    and approximate fusions either way, so the document corpus choice
    cannot move recall."""
    from feature_store_healthcare_spark.operators import similarity

    if not os.path.exists(HOSTILE_MARKER):
        build_hostile_embeddings(spark)
    out: dict = {}
    emb = load_table(spark, HOSTILE_OUT, "embeddings")
    n = emb.count()
    q = emb.where(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = _recall_sets(
        similarity.cosine_topk(q, emb, k=10).collect(), "query_id", "vec_id"
    )
    path = os.path.join(REPO, ".scale", "ivf_recall_hostile")
    t0 = time.time()
    cents = similarity.build_ivf_index(emb, path, n_centroids=16)
    build_sec = round(time.time() - t0, 2)
    times, rows = [], []
    for _ in range(2):
        t0 = time.time()
        rows = similarity.ivf_topk_from_index(
            spark, path, q, k=10, nprobe=4, centroids=cents
        ).collect()
        times.append(time.time() - t0)
    got = _recall_sets(rows, "query_id", "vec_id")
    recalls = [len(exact[k_] & got.get(k_, set())) / len(exact[k_]) for k_ in exact]
    out["ivf_topk_from_index"] = {
        "n_vectors": n,
        "n_queries": len(exact),
        "n_centroids": 16,
        "nprobe": 4,
        "recall_at_10_mean": round(sum(recalls) / len(recalls), 3),
        "recall_at_10_min": round(min(recalls), 3),
        "warm_probe_sec": round(min(times), 2),
        "blas_warm_probe_sec": _ivf_blas_warm(spark, path, q, cents),
        "index_build_sec": build_sec,
        # the IVF dial measured as a frontier on the BLAS serve twin
        # (round 13 — symmetric with the PCA rerank_frontier): recall
        # climbs with probed lists, wall stays matmul-bound
        "nprobe_frontier": _ivf_nprobe_frontier(spark, path, q, cents, exact),
    }
    print(
        f"ann-recall hostile ivf_topk_from_index: {out['ivf_topk_from_index']}",
        file=sys.stderr,
    )
    docs = load_table(spark, OUT, "documents")
    out["hybrid_rrf_ivf_stored"] = _hybrid_recall(spark, docs, emb, path, cents)
    print(
        f"ann-recall hostile hybrid: {out['hybrid_rrf_ivf_stored']}",
        file=sys.stderr,
    )
    out["pca_topk_from_index_blas"] = _pca_recall(spark, emb, exact, n, "hostile")
    print(
        f"ann-recall hostile pca: {out['pca_topk_from_index_blas']}",
        file=sys.stderr,
    )
    return out


def _ivf_blas_warm(spark, path, q, cents) -> float:
    """Warm-probe wall of the rank-identical BLAS serve twin
    (ivf_topk_from_index_blas) on the same index/query batch — emitted
    by the TOOL so the recorded number is regenerable (round-13 review:
    a hand-edited key here was silently dropped by the next run)."""
    import time as _time

    from feature_store_healthcare_spark.operators import similarity

    times = []
    for _ in range(2):
        t0 = _time.time()
        similarity.ivf_topk_from_index_blas(
            spark, path, q, k=10, nprobe=4, centroids=cents
        ).collect()
        times.append(_time.time() - t0)
    return round(min(times), 2)


def _ivf_nprobe_frontier(spark, path, q, cents, exact) -> list:
    """recall@10 + warm wall at nprobe 8 and 12 on the BLAS serve twin
    (nprobe=4 is the headline row above) — tool-emitted like every
    frontier here, so regeneration reproduces it."""
    import time as _time

    from feature_store_healthcare_spark.operators import similarity

    frontier = []
    for nprobe in (8, 12):
        times, rows = [], []
        for _ in range(2):
            t0 = _time.time()
            rows = similarity.ivf_topk_from_index_blas(
                spark, path, q, k=10, nprobe=nprobe, centroids=cents
            ).collect()
            times.append(_time.time() - t0)
        got = _recall_sets(rows, "query_id", "vec_id")
        recalls = [
            len(exact[k_] & got.get(k_, set())) / len(exact[k_]) for k_ in exact
        ]
        frontier.append({
            "nprobe": nprobe,
            "recall_at_10_mean": round(sum(recalls) / len(recalls), 3),
            "recall_at_10_min": round(min(recalls), 3),
            "warm_probe_sec": round(min(times), 2),
        })
    return frontier


def _pca_recall(spark, emb, exact, n, tag) -> dict:
    """Recall@10 + warm probe cost for the stored-PCA serve path
    (round 13 — the same bracket evidence the IVF entry carries): build
    the 32-dim projected index once, probe with the BLAS kernel at the
    production rerank_factor=8, score vs the exact sets."""
    from feature_store_healthcare_spark.operators import similarity

    q = emb.where(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = os.path.join(REPO, ".scale", f"pca_recall_{tag}")
    t0 = time.time()
    comps, mean = similarity.build_pca_index(emb, path, pca_dim=32)
    build_sec = round(time.time() - t0, 2)
    times, rows = [], []
    for _ in range(2):
        t0 = time.time()
        rows = similarity.pca_topk_from_index_blas(
            spark, path, q, k=10, rerank_factor=8,
            components=comps, mean=mean,
        ).collect()
        times.append(time.time() - t0)
    got = _recall_sets(rows, "query_id", "vec_id")
    recalls = [len(exact[k_] & got.get(k_, set())) / len(exact[k_]) for k_ in exact]
    out = {
        "n_vectors": n,
        "n_queries": len(exact),
        "pca_dim": 32,
        "rerank_factor": 8,
        "recall_at_10_mean": round(sum(recalls) / len(recalls), 3),
        "recall_at_10_min": round(min(recalls), 3),
        "warm_probe_sec": round(min(times), 2),
        "index_build_sec": build_sec,
    }
    if tag == "hostile":
        # the governing dial, measured as a frontier (round 13): on the
        # isotropic worst case recall at rf=8 collapses, and widening
        # the re-rank pool is how a caller buys it back — emitted by the
        # TOOL so regeneration can't drop it (review finding: hand-added
        # keys died on the next run)
        frontier = []
        for rf in (32, 128, 512):
            fr_times, fr_rows = [], []
            for _ in range(2):
                t0 = time.time()
                fr_rows = similarity.pca_topk_from_index_blas(
                    spark, path, q, k=10, rerank_factor=rf,
                    components=comps, mean=mean,
                ).collect()
                fr_times.append(time.time() - t0)
            fr_got = _recall_sets(fr_rows, "query_id", "vec_id")
            fr_recalls = [
                len(exact[k_] & fr_got.get(k_, set())) / len(exact[k_])
                for k_ in exact
            ]
            frontier.append({
                "rerank_factor": rf,
                "pool": 10 * rf,
                "recall_at_10_mean": round(sum(fr_recalls) / len(fr_recalls), 3),
                "recall_at_10_min": round(min(fr_recalls), 3),
                "warm_probe_sec": round(min(fr_times), 2),
            })
        out["rerank_frontier"] = frontier
    return out


def run_ann_recall(spark: SparkSession) -> dict:
    """Round-8 VERDICT #4: recall@10 AND warm probe cost at the ×50
    embedding scale (100k vectors, the blow-up dir) for the two
    approximate stored-index consumers — `ivf_topk_from_index` (vs the
    exact brute-force cosine on the same query batch) and the catalog's
    `hybrid_rrf_ivf_stored` (vs the exact `hybrid_rrf_retrieval`).  The
    earlier "recall rising to 0.90 at 100k vectors" claim was
    extrapolated from a 2k-vector frontier; this measures it.

    Caveat recorded with the numbers: the ×50 corpus is 49 slightly
    perturbed replicas of each base vector (±0.0005/coordinate), so each
    query's true top-10 is dominated by its own replica cluster — an
    ANN-FRIENDLY structure (replicas co-assign to the same inverted
    list), unlike the near-random 1× corpus.  Recall here measures the
    replica-clustered regime, not a claim about arbitrary corpora."""
    from feature_store_healthcare_spark.operators import similarity

    out: dict = {}
    emb = load_table(spark, OUT, "embeddings")
    n = emb.count()
    q = emb.where(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact: dict = {}
    for r in similarity.cosine_topk(q, emb, k=10).collect():
        exact.setdefault(r.query_id, set()).add(r.vec_id)

    path = os.path.join(REPO, ".scale", "ivf_recall_x50")
    t0 = time.time()
    cents = similarity.build_ivf_index(emb, path, n_centroids=16)
    build_sec = round(time.time() - t0, 2)
    times, rows = [], []
    for _ in range(2):
        t0 = time.time()
        rows = similarity.ivf_topk_from_index(spark, path, q, k=10, nprobe=4).collect()
        times.append(time.time() - t0)
    got: dict = {}
    for r in rows:
        got.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [len(exact[k_] & got.get(k_, set())) / len(exact[k_]) for k_ in exact]
    out["ivf_topk_from_index"] = {
        "n_vectors": n,
        "n_queries": len(exact),
        "n_centroids": 16,
        "nprobe": 4,
        "recall_at_10_mean": round(sum(recalls) / len(recalls), 3),
        "recall_at_10_min": round(min(recalls), 3),
        "warm_probe_sec": round(min(times), 2),
        "blas_warm_probe_sec": _ivf_blas_warm(spark, path, q, cents),
        "index_build_sec": build_sec,
    }
    print(f"ann-recall ivf_topk_from_index: {out['ivf_topk_from_index']}",
          file=sys.stderr)

    # round-9 VERDICT #1: ≥50 hybrid queries (the catalog entry's 5-query
    # batch was too thin); same fusion construction, rehearsal-sized batch
    docs = load_table(spark, OUT, "documents")
    out["hybrid_rrf_ivf_stored"] = _hybrid_recall(
        spark, docs, emb, path, cents, n_queries=50
    )
    print(f"ann-recall hybrid_rrf_ivf_stored: {out['hybrid_rrf_ivf_stored']}",
          file=sys.stderr)
    out["pca_topk_from_index_blas"] = _pca_recall(spark, emb, exact, n, "x50")
    print(
        f"ann-recall pca_topk_from_index_blas: {out['pca_topk_from_index_blas']}",
        file=sys.stderr,
    )
    return out


def main() -> int:
    # --only a,b,c: measure just those REHEARSAL entries and merge them
    # into an existing SCALE_REHEARSAL.json (incremental re-measurement).
    # --deep: run the events-only DEEP suite at x1000 instead, landing in
    # the report's separate "deep" section.
    deepdocs = "--deep-docs" in sys.argv
    deep = "--deep" in sys.argv and not deepdocs
    names = DEEPDOCS if deepdocs else (DEEP if deep else REHEARSAL)
    if deepdocs:
        # the banded-join family pays a full signature build per timed run
        # at 1M docs — one honest run each, like dedup_ngram_jaccard above
        RUNS.update({
            "dedup_minhash_lsh_fast": 1,
            "dedup_incremental_minhash": 1,
            # live bigram LM re-tokenizes the 1M-doc corpus three ways —
            # one honest run records the cost the stored twin removes
            "bigram_lm_fluency": 1,
        })
    for arg in sys.argv[1:]:
        if arg.startswith("--only="):
            names = [n for n in arg.split("=", 1)[1].split(",") if n]

    spark = rehearsal_spark()
    # host-noise sentinel (round-7 VERDICT ask #7, same fixed CPU job and
    # normalization rule as bench.py / BASELINE.md): calibration wall time
    # brackets the measured suites, so a ×N-scale regression whose ratio is
    # inside the calibration spread is host noise, not code
    from bench import calibration_run

    load_start = os.getloadavg()
    calib_start = calibration_run(spark)
    # validate BEFORE the (expensive) suites run: a typo'd --only name must
    # fail here with the name, not as a NoneType crash mid-suite
    qs = catalog.queries()
    from bench import EXTRA as _BEXTRA

    unknown = [
        n for n in names
        if n not in qs and n not in _BEXTRA and n not in REHEARSAL_EXTRA
    ]
    if unknown:
        raise SystemExit(f"unknown rehearsal entries: {unknown}")
    if deepdocs:
        blow_dir, marker, tag = DEEPDOCS_OUT, DEEPDOCS_MARKER, "deepdocs"
        builder = build_deepdocs
    elif deep:
        blow_dir, marker, tag = DEEP_OUT, DEEP_MARKER, "deep"
        builder = build_deep
    else:
        blow_dir, marker, tag = OUT, MARKER, "big"
        builder = build
    if "--skip-build" not in sys.argv and not os.path.exists(marker):
        builder(spark)
    elif "--skip-build" not in sys.argv:
        print(f"reusing {blow_dir}", file=sys.stderr)
    if "--build-only" in sys.argv:
        return 0

    if "--ann-recall" in sys.argv:
        # recall section only (round-8 VERDICT #4) — merged into the
        # report without touching the timing suites
        ann = run_ann_recall(spark)
        hostile = run_ann_recall_hostile(spark)
        calib_end = calibration_run(spark)
        load_end = os.getloadavg()
        out_path = os.path.join(REPO, "SCALE_REHEARSAL.json")
        report = {}
        if os.path.exists(out_path):
            with open(out_path) as fh:
                report = json.load(fh)
        report["ann_recall"] = {
            "embeddings_factor": FACTORS["embeddings"],
            "documents_factor": FACTORS["documents"],
            "corpus_structure": "49 near-replicas per base (ANN-friendly)",
            "noise": {
                "loadavg_start": [round(x, 2) for x in load_start],
                "loadavg_end": [round(x, 2) for x in load_end],
                "calibration_sec": [calib_start, calib_end],
            },
            **ann,
            # round-9 VERDICT #1: the hostile bracket next to the friendly
            # number — a real corpus sits between the two
            "hostile": {
                "corpus_structure": (
                    "base kept; 24 diffuse perturbed-cluster children "
                    "(0.5*base + noise at corpus spread) + 25 fresh "
                    "hash-random vectors per base"
                ),
                **hostile,
            },
        }
        with open(out_path, "w") as fh:
            json.dump(report, fh, indent=2)
        print(json.dumps(report["ann_recall"]))
        return 0

    base = run_suite(spark, SRC, "1x", names)
    big = run_suite(spark, blow_dir, tag, names)
    calib_end = calibration_run(spark)
    load_end = os.getloadavg()
    noise = {
        "loadavg_start": [round(x, 2) for x in load_start],
        "loadavg_end": [round(x, 2) for x in load_end],
        "calibration_sec": [calib_start, calib_end],
    }

    out_path = os.path.join(REPO, "SCALE_REHEARSAL.json")
    # merge-preserving: an incremental (--only / --deep) run must never
    # drop entries an earlier full run measured
    report: dict = {"src": SRC, "blowup_dir": OUT, "factors": FACTORS}
    if os.path.exists(out_path):
        with open(out_path) as fh:
            report.update(json.load(fh))
    measured = {
        name: {
            "sec_1x": base[name]["sec"],
            f"sec_{tag}": big[name]["sec"],
            "time_ratio": round(big[name]["sec"] / max(base[name]["sec"], 1e-9), 1),
            "rows_1x": base[name]["rows"],
            f"rows_{tag}": big[name]["rows"],
            f"shuffle_write_mb_{tag}": big[name]["shuffle_write_mb"],
            f"peak_stage_shuffle_write_mb_{tag}": big[name][
                "peak_stage_shuffle_write_mb"
            ],
        }
        for name in names
    }
    if deepdocs:
        section = report.setdefault(
            "deepdocs", {"documents_factor": DEEPDOCS_FACTOR, "queries": {}}
        )
        section["noise"] = noise
        section["queries"].update(measured)
        ordered = [n for n in DEEPDOCS if n in section["queries"]] + [
            n for n in section["queries"] if n not in DEEPDOCS
        ]
        section["queries"] = {n: section["queries"][n] for n in ordered}
    elif deep:
        section = report.setdefault(
            "deep", {"events_factor": DEEP_EVENTS_FACTOR, "queries": {}}
        )
        section["noise"] = noise
        section["queries"].update(measured)
        ordered = [n for n in DEEP if n in section["queries"]] + [
            n for n in section["queries"] if n not in DEEP
        ]
        section["queries"] = {n: section["queries"][n] for n in ordered}
    else:
        report["noise"] = noise
        queries = report.get("queries", {})
        queries.update(measured)
        # REHEARSAL order first, then any ad-hoc --only names — a measured
        # entry is never silently dropped from the report
        ordered = [n for n in REHEARSAL if n in queries] + [
            n for n in queries if n not in REHEARSAL
        ]
        report["queries"] = {n: queries[n] for n in ordered}
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=2)
    print(json.dumps({k: v["time_ratio"] for k, v in measured.items()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
