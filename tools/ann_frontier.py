"""Measure the ANN recall-vs-cost frontier: recall@k against the exact
brute-force path and warm per-query-batch runtime for every similarity
strategy the engine ships (brute, sign-LSH+multiprobe, IVF, PCA
two-stage).  Index build time is reported separately — indexes are
build-once/serve-forever by design.

Usage: python tools/ann_frontier.py [sf_dir] [k]
"""

from __future__ import annotations

import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from feature_store_healthcare_spark.operators import similarity  # noqa: E402
from feature_store_healthcare_spark.session import get_spark  # noqa: E402
from feature_store_healthcare_spark.sources import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ann-frontier")
    emb = load_table(spark, sf_dir, "embeddings").persist()
    n = emb.count()
    q = emb.where(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    t0 = time.time()
    exact = {(r.query_id, r.vec_id) for r in similarity.cosine_topk(q, emb, k=k).collect()}
    t_brute_cold = time.time() - t0
    t0 = time.time()
    similarity.cosine_topk(q, emb, k=k).collect()
    t_brute = time.time() - t0

    # sign-LSH (no stored index in this API shape; bucket hash per run)
    t0 = time.time()
    lsh = {(r.query_id, r.vec_id) for r in similarity.rp_lsh_topk(q, emb, k=k, n_planes=4, multiprobe=True).collect()}
    time.time()
    t0 = time.time()
    similarity.rp_lsh_topk(q, emb, k=k, n_planes=4, multiprobe=True).collect()
    t_lsh = time.time() - t0

    # IVF with prebuilt index
    t0 = time.time()
    cents = similarity.ivf_centroids(emb, n_centroids=16)
    assigned = similarity.ivf_assign(emb, cents).persist()
    assigned.count()
    t_ivf_build = time.time() - t0
    t0 = time.time()
    ivf = {(r.query_id, r.vec_id) for r in similarity.ivf_topk(q, emb, k=k, n_centroids=16, nprobe=4, centroids=cents, assigned=assigned).collect()}
    t_ivf = time.time() - t0

    # PCA two-stage with prebuilt projection
    t0 = time.time()
    comps, _, mean = similarity.pca_fit(emb, "embedding", dim=64, k=32)
    proj = (
        similarity.pca_project(emb, comps, mean, out_col="__p")
        .select(F.col("vec_id").alias("__cid"), "__p", "embedding")
        .persist()
    )
    proj.count()
    t_pca_build = time.time() - t0
    t0 = time.time()
    pca = {(r.query_id, r.vec_id) for r in similarity.pca_topk(q, emb, k=k, components=comps, mean=mean, projected_corpus=proj).collect()}
    t_pca = time.time() - t0

    def rec(s):
        return len(exact & s) / len(exact)

    print(f"corpus={n} queries=100 k={k} sf_dir={sf_dir}")
    print(f"{'strategy':<18}{'recall@'+str(k):<12}{'warm s':<10}{'build s':<10}")
    print(f"{'brute (exact)':<18}{1.0:<12.3f}{t_brute:<10.2f}{'-':<10}  (cold {t_brute_cold:.2f})")
    print(f"{'sign-LSH mp':<18}{rec(lsh):<12.3f}{t_lsh:<10.2f}{'-':<10}")
    print(f"{'IVF np=4/16':<18}{rec(ivf):<12.3f}{t_ivf:<10.2f}{t_ivf_build:<10.2f}")
    print(f"{'PCA 32d rr=8':<18}{rec(pca):<12.3f}{t_pca:<10.2f}{t_pca_build:<10.2f}")


if __name__ == "__main__":
    main()
