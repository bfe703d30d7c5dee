"""Record linkage: blocked fuzzy matching on identifier strings
(★ driver-extension surface; the reference's entity model is exact-string
`entity_id` only — feature_registry.py:404-420 — yet its own domain,
healthcare, is where patient identity resolution matters most).

The classic ER pipeline: a cheap deterministic BLOCKING key pairs each
probe row only with candidates that share the block (an equi-join — never
an all-pairs cross join), then an edit-distance filter keeps plausible
matches and an argmin picks the best one per probe.

Scale: the candidate join is an equi-join on the block key — shuffle keys
are as uniform as the blocking scheme; `levenshtein` is a JVM built-in
evaluated only on in-block pairs, so cost is Σ |block|·|probes in block|,
not |left|·|right|.  Block design is the quality/cost dial the caller
owns (pass any Column expression).  The argmin is a partial-aggregatable
``min_by`` — one shuffle, no sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def candidates(
    probes: DataFrame,
    corpus: DataFrame,
    probe_name: str,
    corpus_name: str,
    probe_block: Column,
    corpus_block: Column,
    max_dist: int = 2,
) -> DataFrame:
    """In-block pairs with edit distance ≤ ``max_dist``.  Column name
    collisions between the two sides must be resolved by the caller
    (select/alias) before the join."""
    p = probes.withColumn("__block", probe_block)
    c = corpus.withColumn("__block", corpus_block)
    joined = p.join(c, "__block").withColumn(
        "distance", F.levenshtein(F.col(probe_name), F.col(corpus_name))
    )
    return joined.where(F.col("distance") <= max_dist).drop("__block")


def best_match(
    cands: DataFrame,
    probe_key: str,
    dist_col: str = "distance",
    tiebreak: str | None = None,
) -> DataFrame:
    """One row per probe: the minimum-distance candidate (ties broken by
    ``tiebreak`` ascending) — partial-aggregatable min_by, one shuffle."""
    payload = [c for c in cands.columns if c != probe_key]
    order = (
        F.struct(F.col(dist_col), F.col(tiebreak))
        if tiebreak
        else F.col(dist_col)
    )
    agg = F.min_by(F.struct(*[F.col(c) for c in payload]), order).alias("__m")
    out = cands.groupBy(probe_key).agg(
        agg, F.count(F.lit(1)).alias("n_candidates")
    )
    return out.select(
        probe_key,
        *[F.col(f"__m.{c}").alias(c) for c in payload],
        "n_candidates",
    )
