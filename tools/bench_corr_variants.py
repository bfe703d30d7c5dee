"""One-off: compare decimal-accumulated vs double-accumulated moment sums
for feature_correlation_matrix at sf0.1.  Decides whether the exact-decimal
pattern is worth its cost or whether double sums + fixed rounding of the
final correlation (scale-free, |corr| <= 1) is safe and faster.

Usage: python tools/bench_corr_variants.py [sf_dir]
"""

from __future__ import annotations

import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from feature_store_healthcare_spark.session import get_spark  # noqa: E402
from feature_store_healthcare_spark.sources import load_table  # noqa: E402

COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
PAIRS = [(a, b) for i, a in enumerate(COLS) for b in COLS[i + 1 :]]


def moments(li, mode: str):
    def s(col):
        if mode == "decimal":
            return F.sum(col.cast("decimal(25,6)")).cast("double")
        return F.sum(col.cast("double"))

    aggs = [F.count("*").alias("n")]
    for c in COLS:
        aggs.append(s(F.col(c)).alias(f"s_{c}"))
        aggs.append(s(F.col(c) * F.col(c)).alias(f"ss_{c}"))
    for a, b in PAIRS:
        aggs.append(s(F.col(a) * F.col(b)).alias(f"sp_{a}_{b}"))
    return li.agg(*aggs)


def corr_rows(sdf):
    n = F.col("n")
    entries = []
    for a, b in PAIRS:
        corr = (n * F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")) / (
            F.sqrt(n * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}"))
            * F.sqrt(n * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}"))
        )
        entries.append(
            F.struct(F.lit(a).alias("x"), F.lit(b).alias("y"), corr.alias("c"))
        )
    return sdf.select(F.explode(F.array(*entries)).alias("e")).select(
        "e.x", "e.y", F.round("e.c", 6).alias("c")
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("corr-bench")
    li = load_table(spark, sf_dir, "lineitem")
    li.count()  # warm scan
    out = {}
    for mode in ("decimal", "double", "decimal", "double"):
        t0 = time.perf_counter()
        rows = corr_rows(moments(li, mode)).collect()
        dt = time.perf_counter() - t0
        out.setdefault(mode, []).append(round(dt, 3))
        out.setdefault(f"vals_{mode}", [tuple(r) for r in rows])
    print("decimal:", out["decimal"], "double:", out["double"])
    same = out["vals_decimal"] == out["vals_double"]
    print("rounded-corr values identical:", same)
    if not same:
        for a, b in zip(out["vals_decimal"], out["vals_double"]):
            if a != b:
                print("  differ:", a, b)
    spark.stop()


if __name__ == "__main__":
    main()
