"""Data-quality expectations: declarative checks → violation report
(extends the reference's per-value validated ingest — feature_registry.py:483
``_validate_value`` — to set-oriented, whole-table contracts, the
Deequ/Great-Expectations shape).

Row-local checks (completeness, range, accepted values, custom predicate)
fold into ONE conditional-sum aggregation pass per table — adding a check
adds a column, not a scan.  Set-level checks cost what their semantics
demand: uniqueness is one distinct-count aggregate; referential integrity
is one anti-join against the referenced keys (broadcast when the key set
fits, shuffle otherwise).  The report is a union of one-row frames — tiny,
and every branch is independently Catalyst-optimized.

Scale: violations are COUNTED, not collected — no driver materialization
of bad rows; pair with ``where`` on the same predicate to quarantine them
distributedly when needed.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class RowCheck:
    """A row-local expectation: ``violated`` marks a failing row."""

    name: str
    violated: Column


def not_null(col: str) -> RowCheck:
    return RowCheck(f"not_null({col})", F.col(col).isNull())


def in_range(col: str, lo, hi) -> RowCheck:
    c = F.col(col)
    return RowCheck(
        f"in_range({col},{lo},{hi})", c.isNull() | (c < lo) | (c > hi)
    )


def accepted_values(col: str, values: list) -> RowCheck:
    c = F.col(col)
    return RowCheck(
        f"accepted_values({col})", c.isNull() | ~c.isin(*values)
    )


def satisfies(name: str, predicate: Column) -> RowCheck:
    """Custom expectation: ``predicate`` must hold; violations are rows
    where it is false or null."""
    return RowCheck(name, ~F.coalesce(predicate, F.lit(False)))


def row_checks_report(df: DataFrame, checks: list[RowCheck]) -> DataFrame:
    """All row-local checks in ONE aggregation pass: (check, n_rows,
    n_violations, passed)."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, ch in enumerate(checks):
        aggs.append(
            F.sum(F.when(ch.violated, 1).otherwise(0)).alias(f"__v{i}")
        )
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(ch.name).alias("check"),
                F.col("__n").alias("n_rows"),
                F.col(f"__v{i}").alias("n_violations"),
                (F.col(f"__v{i}") == 0).alias("passed"),
            )
            for i, ch in enumerate(checks)
        ]
    )
    return wide.select(F.explode(rows).alias("__c")).select("__c.*")


def uniqueness_report(df: DataFrame, cols: list[str]) -> DataFrame:
    """(check, n_rows, n_violations, passed) where a violation is any row
    beyond the first of its key — n_rows − n_distinct_keys."""
    name = f"unique({','.join(cols)})"
    agg = df.agg(
        F.count(F.lit(1)).alias("__n"),
        F.countDistinct(*[F.col(c) for c in cols]).alias("__d"),
    )
    return agg.select(
        F.lit(name).alias("check"),
        F.col("__n").alias("n_rows"),
        (F.col("__n") - F.col("__d")).alias("n_violations"),
        (F.col("__n") == F.col("__d")).alias("passed"),
    )


def referential_report(
    df: DataFrame, col: str, ref: DataFrame, ref_col: str
) -> DataFrame:
    """Foreign-key containment: rows of ``df`` whose ``col`` has no match
    in ``ref.ref_col`` (nulls count as violations) — one anti-join."""
    name = f"references({col})"
    keys = ref.select(F.col(ref_col).alias(col)).distinct()
    total = df.agg(F.count(F.lit(1)).alias("__n"))
    orphans = (
        df.select(col)
        .join(keys, col, "left_anti")
        .agg(F.count(F.lit(1)).alias("__v"))
    )
    return total.crossJoin(orphans).select(
        F.lit(name).alias("check"),
        F.col("__n").alias("n_rows"),
        F.col("__v").alias("n_violations"),
        (F.col("__v") == 0).alias("passed"),
    )


def expectation_suite(
    df: DataFrame,
    checks: list[RowCheck],
    unique: list[list[str]] | None = None,
    references: list[tuple[str, DataFrame, str]] | None = None,
) -> DataFrame:
    """Compose row-local + set-level checks into one report frame."""
    parts = [row_checks_report(df, checks)] if checks else []
    for cols in unique or []:
        parts.append(uniqueness_report(df, cols))
    for col, ref, ref_col in references or []:
        parts.append(referential_report(df, col, ref, ref_col))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
