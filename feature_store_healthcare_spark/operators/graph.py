"""Iterative graph analytics on edge DataFrames (★ extension surface —
companion to dedup.connected_components' pointer-jumping; SURVEY.md §4's
"iterative algorithms as fixed-point DataFrame loops").

PageRank here is the canonical bounded-iteration pattern: each round is
one join (rank → out-edges) + one partial-aggregatable sum per dst — the
same two-shuffle shape GraphX/Pregel executes, expressed as plain
DataFrame ops so Catalyst/AQE handle partitioning and skew.  Ranks and
degrees are tiny per-node tables; the edge table is the big side and is
scanned once per iteration (persist it — the loop reuses it verbatim).

Determinism note: per-dst float sums accumulate in shuffle order, so
ranks are reproducible to ~1 ulp·log(fan-in), not bit-exact — fine for
ranking/thresholding; tests pin against numpy power iteration with
allclose.  Lineage is truncated per iteration via localCheckpoint
(same approach as connected_components) so long loops don't build
unbounded plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_store_healthcare_spark.caching import (
    PlanCache,
    data_version,
    release_local_checkpoint,
)

#: One-entry cache for cooccurrence_pmi's distinct (basket, item) table —
#: module lifecycle policy (caching.PlanCache): the table embeds the full
#: upstream basket derivation (typically a sessionize window over the
#: event log), and the operator consumes it four ways (basket count, item
#: counts, both pair-join sides), so an unpersisted plan would recompute
#: the corpus-scale upstream per consumer.
_BASKET_CACHE = PlanCache("cooccurrence_pmi.bi")

#: The PREVIOUS pagerank call's setup caches (e_deg + flagged persists),
#: released lazily at the next call's entry (or via
#: :func:`release_graph_caches`) instead of eagerly before return.
#: Round-15 measured: the eager end-of-call lifecycle (final EAGER
#: checkpoint so both caches could be unpersisted pre-return) cost
#: ~0.5–1.0 s per call at sf0.1 — the one extra full-plan job plus the
#: serialization of the unpersists against the caller's first action —
#: for a leak the deferred slot bounds at ONE call's setup caches.
#: persist() caches only (safe to drop any time: lineage recomputes);
#: the final LAZY checkpoint's blocks are deliberately NOT tracked here —
#: releasing a truncated-lineage checkpoint that the caller may still
#: hold would break re-use ("Checkpoint block not found"), so those
#: blocks are left to the JVM's reference-tracking cleaner.
_PAGERANK_PREV_CACHES: list[DataFrame] = []


def release_graph_caches(blocking: bool = False) -> None:
    """Drop this module's cached operator intermediates now — the eager
    release hook for long-lived sessions (same policy as
    dedup/similarity/retrieval)."""
    _BASKET_CACHE.release(blocking=blocking)
    _release_pagerank_caches(blocking=blocking)


def _release_pagerank_caches(blocking: bool = False) -> None:
    while _PAGERANK_PREV_CACHES:
        try:
            _PAGERANK_PREV_CACHES.pop().unpersist(blocking=blocking)
        except Exception:
            pass  # stopped session / already-released JVM handle


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
    checkpoint_every: int = 1,
    decimal_sums: bool = False,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list.

    Nodes are every id appearing as src OR dst; dangling nodes (no
    out-edges) redistribute their mass uniformly each round (the standard
    correction, keeps Σ rank = 1).  Returns (node, rank) after
    ``iterations`` rounds from the uniform start.

    ``decimal_sums=True`` accumulates the per-dst inflow and dangling
    mass as DECIMAL(38,18) (each double term rounded to 18 dp, then
    summed exactly) — every remaining arithmetic step is a deterministic
    IEEE double op, so ranks become BIT-IDENTICAL across partitionings
    and engines (the oracle-checked mode; ~1 ulp different from the
    default float path).
    """
    # drop the PREVIOUS call's setup caches; blocking so the block
    # removal cannot race a later caller's storage accounting (the
    # frames are node/edge caches whose removal is a few ms)
    _release_pagerank_caches(blocking=True)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # Loop-invariant partitioning: hash-partition the BIG edge side on the
    # join key ONCE and persist — every round's edge⋈rank join then reuses
    # the cached HashPartitioning(src) (InMemoryTableScan preserves
    # outputPartitioning), so the edge table is shuffled once total, not
    # once per iteration.  At 100 TB this is the difference between 1 and
    # `iterations` full-corpus shuffles (the bucketBy-equivalent for an
    # in-session loop; persist to a bucketed table for cross-job reuse).
    e_deg = e.join(out_deg, "src").repartition("src").persist()
    e_deg.count()  # materialize now: every derivation below reads the cache
    # node universe + dangling flag in ONE aggregation over the cached
    # edge table (r15 opt: the r14 setup ran nodes-union-distinct, a
    # src-distinct, a left join, a repartition and TWO counts — ~5 more
    # stage-jobs; max(__h) over the src/dst union is the same
    # (node, __has_out) table, and the src∪dst key set is identical
    # because the inner deg join preserves every edge row).
    #
    # PERSIST (not localCheckpoint): a checkpoint scan reports
    # UnknownPartitioning on this Spark — measured r15: the flagged side
    # of EVERY round's join was being re-exchanged (a full node-table
    # shuffle per round that the r14 comment wrongly believed the
    # LogicalRDD avoided).  InMemoryTableScan preserves
    # outputPartitioning (the e_deg mechanism), and the explicit
    # repartition pins hash(node, shuffle.partitions) — the exact layout
    # EnsureRequirements demands of the per-round grouped side — so the
    # loop joins read the cache with NO flagged exchange at all.  The
    # explicit count sits AFTER the partial-aggregated groupBy (the
    # shuffle carries ~|nodes| combined rows, never 2·|edges|) and is
    # deliberately not AQE-coalesced: a coalesced cache layout would
    # mismatch the rounds' 64-partition grouped exchanges and reinstate
    # the per-round re-shuffle.  Lifecycle: parked in
    # _PAGERANK_PREV_CACHES at return and released by the next call or
    # release_graph_caches (deferred release — see the slot's comment).
    try:
        n_shuffle = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        n_shuffle = edges.sparkSession.sparkContext.defaultParallelism
    flagged = (
        e_deg.select(F.col("src").alias("node"), F.lit(1).alias("__h"))
        .union(e_deg.select(F.col("dst").alias("node"), F.lit(0).alias("__h")))
        .groupBy("node")
        .agg(F.max("__h").alias("__h"))
        .select(
            "node",
            F.when(F.col("__h") == 1, F.lit(True)).alias("__has_out"),
        )
        .repartition(n_shuffle, "node")
        .persist()
    )
    # n and the dangling-existence gate off the SAME job that
    # materializes the flagged cache (count("__has_out") counts the
    # non-NULL flags = nodes with out-edges)
    cnt = flagged.agg(
        F.count(F.lit(1)).alias("n"), F.count("__has_out").alias("n_out")
    ).collect()[0]
    n, has_dangling = cnt["n"], cnt["n"] > cnt["n_out"]
    # lazy checkpoints + immediate predecessor release are only safe when
    # AQE materializes each round's intermediate stages during plan
    # construction; with AQE off, construction runs NO jobs, so the
    # superseded checkpoint would be released while still the sole input
    # of an uncomputed lineage-truncated RDD (r14 ADVICE #1) — fall back
    # to eager checkpoints there (one extra job per round, always safe).
    lazy_ck = (
        edges.sparkSession.conf.get("spark.sql.adaptive.enabled", "true").lower()
        == "true"
    )
    dsum = (
        (lambda c: F.sum(c.cast("decimal(38,18)")).cast("double"))
        if decimal_sums
        else F.sum
    )
    ranks = flagged.withColumn("rank", F.lit(1.0 / n))
    last_ck = None  # the most recent loop checkpoint, released on supersede
    for i in range(iterations):
        # NOTE (r15, measured): fusing the dangling mass into the
        # contribs shuffle as sentinel-keyed union rows was built and
        # interleave-A/B'd here — min-of-6 8.0 s vs 5.9 s for this shape
        # (every rep slower, +3 jobs): the wider union map and the
        # second aggregate column cost more than the dedicated
        # single-row aggregate they replaced.  Rejected; the per-round
        # win came from the flagged cache layout above instead.
        contribs = (
            e_deg.join(
                # shuffle-hash: build from the small per-node rank table —
                # a sort-merge join would re-SORT the big cached edge side
                # every round
                ranks.select(F.col("node").alias("src"), "rank").hint(
                    "shuffle_hash"
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(dsum(F.col("rank") / F.col("deg")).alias("__in"))
        )
        # shuffle-hash here too: SMJ would re-sort both per-node tables
        # every round for no benefit (neither side is sorted)
        joined = flagged.join(contribs.hint("shuffle_hash"), "node", "left")
        if has_dangling:
            # dangling mass: rank held by nodes with no out-edges this
            # round — a single-row aggregate, broadcast into the plan
            dangling = ranks.where(F.col("__has_out").isNull()).agg(
                F.coalesce(dsum(F.col("rank")), F.lit(0.0)).alias("__dm")
            )
            joined = joined.crossJoin(F.broadcast(dangling))
            dm_col = F.col("__dm")
        else:
            # no dangling nodes (precomputed gate): the aggregate would
            # return COALESCE(NULL, 0.0) every round — the literal is the
            # same value without the per-round scan-and-aggregate
            dm_col = F.lit(0.0)
        ranks = joined.select(
            "node",
            "__has_out",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping)
                * (F.coalesce(F.col("__in"), F.lit(0.0)) + dm_col / n)
            ).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0:
            # each round reads `ranks` TWICE (contribs + dangling): without
            # truncation the prior rounds' DAG re-executes 2^k-fold.
            # eager=False (r14 opt): under AQE, building the checkpoint's
            # RDD (toRdd) already materializes every intermediate stage —
            # the round's contribs shuffle, the dangling broadcast —
            # as jobs; an eager checkpoint would add one more full job per
            # round just to write the final projection's blocks, which the
            # NEXT round's stage construction materializes anyway when it
            # reads this RDD.  One scheduling round-trip per iteration
            # instead of two; plans, partitioning and results unchanged
            # (bit-exact, decimal sums).  With AQE off: eager=True (see
            # lazy_ck above).
            # the LAST round's checkpoint stays LAZY too (r15 re-measure):
            # forcing it eager so the setup caches could be unpersisted
            # pre-return cost ~0.5–1.0 s per call (one extra full-plan
            # job serialized against the caller's first action) —
            # interleaved A/B min-of-6: 3.2–3.7 s lazy+deferred-release
            # vs 4.1–4.7 s eager+unpersist.  The caller's first action
            # materializes it instead; the setup caches it still reads
            # are released at the NEXT call (_PAGERANK_PREV_CACHES).
            ranks = ranks.localCheckpoint(eager=not lazy_ck)
            # free the SUPERSEDED checkpoint's blocks: constructing this
            # round's stages (lazy mode) or running the eager checkpoint
            # job was its last reader (the lazy final stage reads only
            # `flagged` + this round's shuffle/broadcast outputs), so the
            # predecessor is fully consumed by now (Dataset.unpersist is
            # a no-op for RDD-level checkpoint storage —
            # caching.release_local_checkpoint); `flagged`'s blocks stay:
            # every round still reads it
            if last_ck is not None:
                release_local_checkpoint(last_ck)
            last_ck = ranks
    # deferred release (r15): the returned plan is a LAZY checkpoint that
    # still reads both setup caches until the caller's first action runs,
    # so they cannot be unpersisted here without either an extra eager
    # materialization job (measured ~0.5–1.0 s/call) or a full recompute
    # on use.  Park them in the module slot; the next pagerank call (or
    # release_graph_caches) frees them — a bounded one-call leak, the
    # same deferred-release policy as the module PlanCaches.
    _PAGERANK_PREV_CACHES.extend([e_deg, flagged])
    return ranks.select("node", "rank")


def cooccurrence_pmi(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Pointwise mutual information between items co-occurring in the same
    basket (session/document/order) — the classic association signal that
    seeds item embeddings (word2vec's training objective approximates a
    shifted version of exactly this matrix).

    ``PMI(a,b) = ln( P(a,b) / (P(a)·P(b)) )`` with probabilities over
    baskets (set semantics: an item counts once per basket).  Distinct
    (basket, item) → per-item basket counts AND within-basket pair
    equi-join (a < b) → counts ratio.  The pair join is per-basket, so the
    blow-up is bounded by items-per-basket², never |items|²; shuffle keys
    are baskets (uniform).  All counts are exact integers; PMI's log is
    rounded.  Output: (item_a, item_b, n_baskets, n_a, n_b, n_ab, pmi).

    The distinct (basket, item) table is persisted through the module's
    one-entry PlanCache: it embeds the corpus-scale basket derivation
    (e.g. a sessionize window over the event log) and feeds FOUR
    consumers — the basket count (this call's materializing action), the
    item counts, and both pair-join sides — which would otherwise each
    recompute it (ReuseExchange only dedupes the join sides' identical
    exchange, not the other two branches: the uncached executed plan
    carries FOUR events scans, the cached one a single computation + four
    InMemoryTableScans).  Local wall-time is unchanged at sf0.1 (the
    pair join dominates 100k events); the recompute being removed is the
    sessionize window over the event log, which at the ×1000 rehearsal
    scale shuffles 2.33 GB per copy.  Released on the next
    different-input call or :func:`release_graph_caches`.
    """
    bi = _BASKET_CACHE.get_or_persist(
        baskets.select(
            F.col(basket_col).alias("b"), F.col(item_col).alias("i")
        ).distinct(),
        version=data_version(baskets),
    )
    n_baskets = bi.select("b").distinct().count()
    item_counts = bi.groupBy(F.col("i")).agg(F.count(F.lit(1)).alias("n_i"))
    left = bi.alias("l")
    right = bi.alias("r")
    pairs = (
        left.join(
            right,
            on=[F.col("l.b") == F.col("r.b"), F.col("l.i") < F.col("r.i")],
        )
        .groupBy(
            F.col("l.i").alias("item_a"), F.col("r.i").alias("item_b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    na = item_counts.select(F.col("i").alias("item_a"), F.col("n_i").alias("n_a"))
    nb = item_counts.select(F.col("i").alias("item_b"), F.col("n_i").alias("n_b"))
    joined = pairs.join(F.broadcast(na), "item_a").join(F.broadcast(nb), "item_b")
    pmi = F.log(
        (F.col("n_ab").cast("double") * F.lit(float(n_baskets)))
        / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
    )
    return joined.select(
        "item_a",
        "item_b",
        F.lit(n_baskets).alias("n_baskets"),
        "n_a",
        "n_b",
        "n_ab",
        F.round(pmi, round_to).alias("pmi"),
    )
