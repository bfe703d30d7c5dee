"""Round-15 scale-rehearsal rows (r14 VERDICT #9): measure the two r14
mechanisms off the noisy bench host and append the evidence to
SCALE_REHEARSAL.json under the "r15" key.

1. REBALANCE'd IVF index build at the rehearsal's x50 embeddings blow-up
   (~100k vectors, the ann_recall corpus recipe): build wall time,
   files-per-inverted-list distribution on disk (the r14 claim: AQE-sized
   files per list instead of n_scan_partitions x n_lists fragments), and
   one warm stored-probe wall.
2. Parquet schema-inference memo hit rate over a bench-like pass (every
   HEADLINE query built twice), plus the measured per-call load_table
   cost on hit vs forced miss.

Usage: python tools/rehearsal_r15.py
"""

from __future__ import annotations

import collections
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
from feature_store_healthcare_spark import queries as catalog  # noqa: E402
from feature_store_healthcare_spark.operators import similarity  # noqa: E402
from feature_store_healthcare_spark.session import get_spark  # noqa: E402
from feature_store_healthcare_spark.sources import load_table  # noqa: E402
from feature_store_healthcare_spark.sources import tables as src_tables  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(REPO, ".scale", "r15_ivf")


def ivf_build_row(spark) -> dict:
    emb = load_table(spark, SRC, "embeddings")
    r = F.col("__r")
    rep = emb.crossJoin(F.broadcast(spark.range(50).withColumnRenamed("id", "__r")))
    perturbed = F.transform(
        "embedding",
        lambda x, i: x + ((r * 37 + i * 11) % 13 - 6).cast("float") * 0.0005,
    )
    big = rep.select(
        (F.col("vec_id") + r * 1_000_000).alias("vec_id"),
        perturbed.alias("embedding"),
        "label",
    )
    n_vectors = big.count()
    if os.path.exists(OUT):
        shutil.rmtree(OUT)
    t0 = time.time()
    cents = similarity.build_ivf_index(big, OUT, n_centroids=16)
    build_sec = round(time.time() - t0, 2)
    per_list = collections.Counter()
    for d in os.listdir(OUT):
        if d.startswith("__list="):
            per_list[d] = sum(
                1 for f in os.listdir(os.path.join(OUT, d)) if f.endswith(".parquet")
            )
    files = sorted(per_list.values())
    qs = big.limit(100).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    t0 = time.time()
    similarity.ivf_topk_from_index(
        spark, OUT, qs, k=10, centroids=cents
    ).write.format("noop").mode("overwrite").save()
    probe1 = round(time.time() - t0, 2)
    t0 = time.time()
    similarity.ivf_topk_from_index(
        spark, OUT, qs, k=10, centroids=cents
    ).write.format("noop").mode("overwrite").save()
    probe_warm = round(time.time() - t0, 2)
    return {
        "n_vectors": n_vectors,
        "n_centroids": 16,
        "index_build_sec": build_sec,
        "n_list_dirs": len(per_list),
        "files_total": sum(files),
        "files_per_list_min": files[0] if files else 0,
        "files_per_list_median": files[len(files) // 2] if files else 0,
        "files_per_list_max": files[-1] if files else 0,
        "probe_first_sec": probe1,
        "probe_warm_sec": probe_warm,
    }


def schema_memo_row(spark) -> dict:
    hits = misses = 0
    orig_get = src_tables._SCHEMA_MEMO.get

    def counting_get(key, default=None):
        nonlocal hits, misses
        v = orig_get(key, default)
        if v is None:
            misses += 1
        else:
            hits += 1
        return v

    src_tables._SCHEMA_MEMO.get = counting_get  # type: ignore[attr-defined]
    try:
        qs = catalog.queries()
        for name in bench.HEADLINE:
            for _ in range(2):  # the bench's min-of-2 shape
                qs[name](spark, SRC)
    finally:
        src_tables._SCHEMA_MEMO.get = orig_get  # type: ignore[attr-defined]
    # per-call cost, hit vs forced miss
    t0 = time.time()
    for _ in range(20):
        load_table(spark, SRC, "lineitem")
    hit_ms = (time.time() - t0) / 20 * 1000
    t0 = time.time()
    for _ in range(5):
        src_tables._SCHEMA_MEMO.clear()
        load_table(spark, SRC, "lineitem")
    miss_ms = (time.time() - t0) / 5 * 1000
    return {
        "headline_pass_hits": hits,
        "headline_pass_misses": misses,
        "hit_rate": round(hits / max(hits + misses, 1), 4),
        "load_table_hit_ms": round(hit_ms, 1),
        "load_table_miss_ms": round(miss_ms, 1),
    }


def main() -> None:
    spark = get_spark("fshs-rehearsal-r15")
    load_table(spark, SRC, "region").count()
    catalog.ensure_worker_imports(spark)
    row = {
        "src": SRC,
        "ivf_rebalance_x50": ivf_build_row(spark),
        "schema_memo": schema_memo_row(spark),
    }
    path = os.path.join(REPO, "SCALE_REHEARSAL.json")
    data = json.load(open(path))
    data["r15"] = row
    with open(path, "w") as fh:
        json.dump(data, fh, indent=1, sort_keys=True)
    print(json.dumps(row, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
