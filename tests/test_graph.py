"""PageRank (operators.graph) pinned against numpy power iteration with
identical semantics (uniform start, dangling redistribution)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from feature_store_healthcare_spark.operators.graph import pagerank


def _numpy_pagerank(edges, n, iters=10, d=0.85):
    deg = np.zeros(n)
    for s, _ in edges:
        deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1 - d) / n)
        dangling = r[deg == 0].sum()
        nxt += d * dangling / n
        for s, t in edges:
            nxt[t] += d * r[s] / deg[s]
        r = nxt
    return r


def _run(spark, edges, n, iters=10):
    df = spark.createDataFrame([Row(src=s, dst=t) for s, t in edges])
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=iters).collect()}
    want = _numpy_pagerank(edges, n, iters=iters)
    # nodes with no edges at all aren't in the frame; compare present ones
    for node, rank in got.items():
        assert abs(rank - want[node]) < 1e-9, (node, rank, want[node])
    return got, want


def test_star_graph_center_dominates(spark):
    edges = [(i, 0) for i in range(1, 6)]
    got, want = _run(spark, edges, 6)
    assert got[0] == max(got.values())
    assert got[0] > 0.4


def test_cycle_is_uniform(spark):
    edges = [(i, (i + 1) % 5) for i in range(5)]
    got, _ = _run(spark, edges, 5)
    vals = list(got.values())
    assert max(vals) - min(vals) < 1e-12
    assert abs(sum(vals) - 1.0) < 1e-9


def test_dangling_mass_conserved(spark):
    # node 2 has no out-edges: its mass must redistribute, total stays 1
    edges = [(0, 1), (1, 2), (0, 2)]
    got, want = _run(spark, edges, 3)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got[2] == max(got.values())


@pytest.mark.parametrize("seed", [3, 7])
def test_random_graph_matches_numpy(spark, seed):
    rng = np.random.default_rng(seed)
    n = 25
    edges = list(
        {
            (int(a), int(b))
            for a, b in zip(rng.integers(0, n, 120), rng.integers(0, n, 120))
            if a != b
        }
    )
    _run(spark, edges, n, iters=12)


class TestCooccurrencePMI:
    def test_pmi_signs_and_counts(self, spark):
        from feature_store_healthcare_spark.operators.graph import (
            cooccurrence_pmi,
        )

        # a,b always together (4 baskets); c alone in 4 others -> (a,b)
        # positively associated; (a,c)/(b,c) never co-occur (absent rows)
        rows = []
        for s in range(4):
            rows += [Row(b=f"s{s}", i="a"), Row(b=f"s{s}", i="b")]
        for s in range(4, 8):
            rows.append(Row(b=f"s{s}", i="c"))
        out = {
            (r["item_a"], r["item_b"]): r
            for r in cooccurrence_pmi(spark.createDataFrame(rows), "b", "i").collect()
        }
        assert set(out) == {("a", "b")}
        r = out[("a", "b")]
        assert r["n_baskets"] == 8 and r["n_a"] == 4 and r["n_ab"] == 4
        # PMI = ln(4*8/(4*4)) = ln 2
        import math

        assert abs(r["pmi"] - round(math.log(2), 6)) < 1e-9

    def test_set_semantics_within_basket(self, spark):
        from feature_store_healthcare_spark.operators.graph import (
            cooccurrence_pmi,
        )

        rows = [Row(b="s", i="a")] * 5 + [Row(b="s", i="b")]
        r = cooccurrence_pmi(spark.createDataFrame(rows), "b", "i").collect()[0]
        assert r["n_ab"] == 1 and r["n_a"] == 1  # duplicates collapse
