"""Leakage-safe target encoding (★ driver-extension surface; no reference
analog — its features are raw stored values, feature_registry.py:430).

Target (mean) encoding replaces a categorical with the mean of the label
over that category — powerful and notoriously leaky: a row must never see
its own label.  The standard fix is K-fold leave-fold-out: the encoding a
row in fold f sees is computed from every OTHER fold,

    enc(cat, f) = (sum(cat) - sum(cat, f) + w·prior) / (n(cat) - n(cat, f) + w)

with ``w`` virtual prior-mean observations smoothing rare categories.
Folds come from the repo's salted-md5 split (deterministic, repartition-
proof, no RNG).

Plan shape: ONE partial-aggregatable groupBy on (category, fold); per-
category totals and the global prior are window sums over that tiny
(|cats| × K) table — the fact is scanned exactly once.  Label sums are
decimal-accumulated then double-valued, so the arithmetic is
order-independent and oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from feature_store_healthcare_spark.operators.sampling import split_label


def fold_weights(k: int) -> dict[str, float]:
    return {f"f{i}": 1.0 for i in range(k)}


def target_encoding(
    df: DataFrame,
    category: str,
    target: str,
    key: str,
    n_folds: int = 4,
    prior_weight: float = 20.0,
    salt: str = "te",
    round_to: int = 6,
) -> DataFrame:
    """The leave-fold-out encoder map: one row per (category, fold) with
    the encoding rows of that fold must use, plus diagnostics."""
    folded = df.withColumn(
        "fold", split_label(key, fold_weights(n_folds), salt=salt)
    )
    cell = folded.groupBy(category, "fold").agg(
        F.sum(F.col(target).cast("decimal(25,6)")).alias("__s"),
        F.count(F.lit(1)).alias("__n"),
    )
    wc = Window.partitionBy(category)
    wg = Window.partitionBy()
    g = (
        cell.withColumn("__s_cat", F.sum("__s").over(wc))
        .withColumn("__n_cat", F.sum("__n").over(wc))
        .withColumn("__s_all", F.sum("__s").over(wg))
        .withColumn("__n_all", F.sum("__n").over(wg))
    )
    prior = F.col("__s_all").cast("double") / F.col("__n_all")
    s_out = (F.col("__s_cat") - F.col("__s")).cast("double")
    n_out = F.col("__n_cat") - F.col("__n")
    enc = (s_out + F.lit(prior_weight) * prior) / (n_out + F.lit(prior_weight))
    return g.select(
        F.col(category),
        F.col("fold"),
        F.round(enc, round_to).alias("encoding"),
        F.col("__n").alias("n_in_fold"),
        n_out.alias("n_out_of_fold"),
        F.round(prior, round_to).alias("prior_mean"),
    )
