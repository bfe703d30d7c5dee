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


def release_graph_caches(blocking: bool = False) -> None:
    """Drop this module's cached operator intermediates now — the eager
    release hook for long-lived sessions (same policy as
    dedup/similarity/retrieval)."""
    _BASKET_CACHE.release(blocking=blocking)


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
    # nodes DERIVE from the cached e_deg, not from e: the inner join on
    # src preserves every edge row, so src∪dst is identical — but reading
    # e four ways (nodes' union twice, out_deg, e_deg) re-ran the
    # upstream scan+DISTINCT per consumer (r14 opt: setup was ~4 edge
    # derivations; now exactly one, the e_deg materialization above).
    nodes = (
        e_deg.select(F.col("src").alias("node"))
        .union(e_deg.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    # dangling FLAG precomputed once (topology is loop-invariant) — the
    # per-round anti-join was pure overhead.  Pre-partition on node so the
    # per-round flagged⋈contribs join reuses this side's layout too
    # (localCheckpoint preserves outputPartitioning via LogicalRDD).
    flagged = (
        nodes.join(
            # from the CACHED e_deg (src-distinct = the out-degree key
            # set), not out_deg — whose lineage would re-run the upstream
            # edge derivation a second time
            e_deg.select(F.col("src").alias("node"))
            .distinct()
            .withColumn("__has_out", F.lit(True)),
            "node",
            "left",
        )
        .repartition("node")
        # lazy for the same reason as the loop checkpoints below: round
        # 1's stage construction materializes it — no dedicated job
        .localCheckpoint(eager=False)
    )
    ranks = flagged.withColumn("rank", F.lit(1.0 / n))
    last_ck = None  # the most recent loop checkpoint, released on supersede
    for i in range(iterations):
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
            .agg(
                (
                    F.sum((F.col("rank") / F.col("deg")).cast("decimal(38,18)"))
                    .cast("double")
                    if decimal_sums
                    else F.sum(F.col("rank") / F.col("deg"))
                ).alias("__in")
            )
        )
        # dangling mass: rank held by nodes with no out-edges this round
        dangling = (
            ranks.where(F.col("__has_out").isNull())
            .agg(
                F.coalesce(
                    (
                        F.sum(F.col("rank").cast("decimal(38,18)")).cast("double")
                        if decimal_sums
                        else F.sum("rank")
                    ),
                    F.lit(0.0),
                ).alias("__dm")
            )
        )
        ranks = (
            # shuffle-hash here too: SMJ would re-sort both per-node
            # tables every round for no benefit (neither side is sorted)
            flagged.join(contribs.hint("shuffle_hash"), "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                "__has_out",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("__in"), F.lit(0.0)) + F.col("__dm") / n)
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            # each round reads `ranks` TWICE (contribs + dangling): without
            # truncation the prior rounds' DAG re-executes 2^k-fold.
            # eager=False (r14 opt): under AQE, building the checkpoint's
            # RDD (toRdd) already materializes every intermediate stage —
            # the round's contribs shuffle, the dangling broadcast — as
            # jobs; an eager checkpoint would add one more full job per
            # round just to write the final projection's blocks, which the
            # NEXT round's stage construction materializes anyway when it
            # reads this RDD.  One scheduling round-trip per iteration
            # instead of two; plans, partitioning and results unchanged
            # (bit-exact, decimal sums).
            ranks = ranks.localCheckpoint(eager=False)
            # free the SUPERSEDED checkpoint's blocks: constructing this
            # round's stages was its last reader (the lazy final stage
            # reads only `flagged` + this round's shuffle/broadcast
            # outputs), so the predecessor is fully consumed by now
            # (Dataset.unpersist is a no-op for RDD-level checkpoint
            # storage — caching.release_local_checkpoint); `flagged`'s
            # blocks stay: every round still reads it
            if last_ck is not None:
                release_local_checkpoint(last_ck)
            last_ck = ranks
    e_deg.unpersist()
    nodes.unpersist()
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
