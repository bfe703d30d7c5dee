"""Experiment analysis: deterministic A/B assignment + CUPED variance
reduction (★ driver-extension surface — the reference has no experiment
tooling; its closest concept is per-feature serving metrics,
feature_server.py:481-493).

CUPED (Controlled-experiment Using Pre-Experiment Data, Deng et al. 2013)
is the standard trick for shrinking metric variance with a pre-period
covariate: ``Y' = Y − θ·(X − mean(X))`` with ``θ = cov(X,Y)/var(X)``.
All moments here accumulate as fixed-scale decimals in ONE pass over the
per-user metric table, so θ and the adjusted means are bit-deterministic
under any partitioning — an external engine reproduces them exactly.

Plan shape: per-user metric aggregation (one shuffle on user) → one
single-row moment aggregate (broadcast) → per-arm rollup.  The fact table
is scanned once; everything after the per-user table is tiny.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: md5-prefix width for arm assignment (same convention as operators.sampling)
_PREFIX = 8


def ab_assign(key: Column | str, salt: str = "ab", treat_frac: float = 0.5) -> Column:
    """Deterministic experiment arm per key: 'treatment' when the salted
    md5 prefix lands below the fraction bound, else 'control'.  No RNG —
    the same user is in the same arm on every run and engine."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.substring(
        F.md5(F.concat(F.lit(f"{salt}:"), c.cast("string"))), 1, _PREFIX
    )
    bound = format(int(treat_frac * (16**_PREFIX)), f"0{_PREFIX}x")
    return F.when(h < F.lit(bound), F.lit("treatment")).otherwise(F.lit("control"))


def cuped(
    per_user: DataFrame,
    arm_col: str = "arm",
    pre_col: str = "x",
    post_col: str = "y",
    round_to: int = 6,
) -> DataFrame:
    """CUPED-adjusted per-arm means from a per-user (arm, pre, post) table.

    θ is estimated POOLED across arms (the standard unbiased-under-
    randomization choice: assignment is independent of X).  Output one row
    per arm: (arm, n_users, mean_post, mean_post_cuped, theta,
    var_reduction_pct) — var_reduction_pct is the pooled theoretical
    reduction ``ρ²·100`` rounded to 2.
    """
    x = F.col(pre_col).cast("double")
    y = F.col(post_col).cast("double")
    dec = lambda c: F.sum(c.cast("decimal(30,10)")).cast("double")  # noqa: E731
    mom = per_user.agg(
        F.count(F.lit(1)).alias("__n"),
        dec(x).alias("__sx"),
        dec(y).alias("__sy"),
        dec(x * x).alias("__sxx"),
        dec(y * y).alias("__syy"),
        dec(x * y).alias("__sxy"),
    )
    n = F.col("__n")
    mean_x = F.col("__sx") / n
    var_x = (F.col("__sxx") - F.col("__sx") * F.col("__sx") / n) / (n - 1)
    var_y = (F.col("__syy") - F.col("__sy") * F.col("__sy") / n) / (n - 1)
    cov = (F.col("__sxy") - F.col("__sx") * F.col("__sy") / n) / (n - 1)
    mom = mom.select(
        n.alias("__n"),
        mean_x.alias("__mean_x"),
        (cov / var_x).alias("__theta"),
        (cov * cov / (var_x * var_y)).alias("__rho2"),
    )
    adj = per_user.crossJoin(F.broadcast(mom)).withColumn(
        "__y_adj", y - F.col("__theta") * (x - F.col("__mean_x"))
    )
    return (
        adj.groupBy(arm_col)
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            (dec(y) / F.count(F.lit(1))).alias("__mean_post"),
            (dec(F.col("__y_adj")) / F.count(F.lit(1))).alias("__mean_adj"),
            F.first("__theta").alias("__theta"),
            F.first("__rho2").alias("__rho2"),
        )
        .select(
            F.col(arm_col),
            "n_users",
            F.round("__mean_post", round_to).alias("mean_post"),
            F.round("__mean_adj", round_to).alias("mean_post_cuped"),
            F.round("__theta", round_to).alias("theta"),
            F.round(F.col("__rho2") * 100, 2).alias("var_reduction_pct"),
        )
    )
