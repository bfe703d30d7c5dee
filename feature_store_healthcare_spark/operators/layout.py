"""Physical layout operators: Z-order clustering for data skipping
(SURVEY.md §4.3 — "online store ... Z-order by (entity_type, entity_id) for
point-get locality"; the Delta OPTIMIZE ZORDER analog on plain parquet).

Parquet readers skip row groups whose column min/max can't satisfy a
predicate.  Sorting by one column gives perfect skipping on that column and
none on others; interleaving the bits of several columns' *ranks* (a Morton
/ Z-curve) clusters rows so that ranges of EVERY interleaved column map to
few row groups — multi-column point-gets and range scans prune most of the
file without any index structure.

Plan shape (default ``strategy="approx"`` — the 100 TB path): ONE
``percentile_approx`` aggregate computes per-dim cut points (a single
map-side-combinable pass, no sort, driver collect of ``dims × levels``
doubles) → each dim quantizes against its cut-point array with a
higher-order ``aggregate`` expression (codegen, literal array) → interleave
bits JVM-side → repartitionByRange + local sort on the z-value → write.
One range shuffle total; no global window anywhere.

``strategy="exact"`` keeps the original per-dim ``percent_rank`` global
window — byte-exact rank quantiles, but the window funnels the entire
table through ONE task per dim, so it is for tests and small tables only.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _interleave(cols: list[Column], bits: int) -> Column:
    """Morton code: bit i of dim d lands at position i*ndims+d."""
    z = F.lit(0).cast("long")
    for b in range(bits):
        for d, c in enumerate(cols):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * len(cols) + d))
    return z


def _numeric_proxy(df: DataFrame, col: str) -> Column:
    """A double-valued stand-in preserving what the curve needs.

    Numerics/booleans keep their order (range scans prune).  Dates and
    timestamps map to epoch micros (order kept).  Strings/binary/other hash
    via xxhash64 — order is lost (categorical dims have no meaningful range
    predicate anyway) but the hash spreads values uniformly, which is
    exactly what even quantization wants for point-get skipping.
    """
    dt = df.schema[col].dataType
    c = F.col(col)
    if isinstance(dt, T.NumericType) or isinstance(dt, T.BooleanType):
        return c.cast("double")
    if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(c.cast("timestamp")).cast("double")
    return F.xxhash64(c).cast("double")


def _quantize_by_cuts(proxy: Column, cuts: Sequence[float]) -> Column:
    """Bucket index = rank of the value among the sorted cut points,
    computed by a balanced binary-search tree of nested WHENs: ⌈log₂ 256⌉
    = 8 comparisons per row, whole-stage codegen.  (A higher-order
    ``aggregate`` over a literal cut array reads nicer but evaluates its
    lambda INTERPRETED per element — 255 evals/row/dim, measured ~20×
    slower on the sf0.1 write.)  NULL proxies fail every comparison and
    land in bucket 0 (parity with percent_rank's nulls-first)."""
    if not cuts:
        return F.lit(0).cast("long")

    def tree(lo: int, hi: int) -> Column:
        # bucket index in [lo, hi]; cuts[b-1] is bucket b's lower bound
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi + 1) // 2
        return F.when(proxy >= F.lit(float(cuts[mid - 1])), tree(mid, hi)).otherwise(
            tree(lo, mid - 1)
        )

    return tree(0, len(cuts)).cast("long")


def zorder_value(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 8,
    strategy: str = "approx",
    relative_error: float = 0.001,
) -> DataFrame:
    """Append a ``__z`` Morton-code column over the ranked dims.

    Ranks (not raw values) make the curve distribution-agnostic — skewed
    or categorical dims quantize evenly.  ``bits`` levels per dim; 8 bits ×
    up to 8 dims fits the 64-bit z-value.

    ``strategy="approx"`` (default): per-dim cut points from ONE
    ``percentile_approx`` aggregate (error ``relative_error`` in rank
    space), no global sort — the shape that survives 100 TB.
    ``strategy="exact"``: per-dim ``percent_rank`` global window —
    single-partition per dim, small tables/tests only.
    """
    levels = (1 << bits) - 1
    if strategy == "exact":
        ranked = []
        out = df
        for i, c in enumerate(cols):
            w = Window.orderBy(F.col(c))
            out = out.withColumn(
                f"__r{i}", (F.percent_rank().over(w) * levels).cast("long")
            )
            ranked.append(F.col(f"__r{i}"))
        out = out.withColumn("__z", _interleave(ranked, bits))
        return out.drop(*[f"__r{i}" for i in range(len(cols))])
    if strategy != "approx":
        raise ValueError(f"strategy must be approx|exact, got {strategy!r}")

    proxies = {c: _numeric_proxy(df, c) for c in cols}
    probs = [j / (levels + 1) for j in range(1, levels + 1)]
    accuracy = max(100, int(1.0 / relative_error))
    # One aggregate job for ALL dims; the collect is dims × levels doubles.
    cuts_row = df.agg(
        *[
            F.percentile_approx(proxies[c], F.array(*[F.lit(p) for p in probs]), accuracy).alias(c)
            for c in cols
        ]
    ).first()
    ranked = []
    out = df
    for i, c in enumerate(cols):
        cuts = cuts_row[c] or []
        out = out.withColumn(f"__r{i}", _quantize_by_cuts(proxies[c], cuts))
        ranked.append(F.col(f"__r{i}"))
    out = out.withColumn("__z", _interleave(ranked, bits))
    return out.drop(*[f"__r{i}" for i in range(len(cols))])


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 8,
    bits: int = 8,
    mode: str = "overwrite",
    strategy: str = "approx",
) -> None:
    """Write ``df`` Z-ordered on ``cols``: range-partition by the z-value
    (each output file owns a contiguous curve segment) and sort within
    partitions, so every file's min/max on EACH dim covers a small slab.

    Default ``strategy="approx"`` computes the curve from sampled quantile
    cut points — one aggregate pass, no global window — so the write is a
    scan + one range shuffle regardless of table size.
    """
    z = zorder_value(df, cols, bits=bits, strategy=strategy)
    (
        z.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
