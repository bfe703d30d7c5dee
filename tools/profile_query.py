"""Per-query cost breakdown: construction vs physical planning vs execution.

Usage: python tools/profile_query.py name1,name2[,...] [N]

For each named bench entry, after one warm-up build+run, measures min-of-N:

- ``build_s``   — the catalog fn() call: py4j construction + (classic mode)
  eager analysis of every transformation.
- ``plan_s``    — queryExecution().executedPlan on a fresh frame (optimizer
  + physical planning, pre-AQE).
- ``exec_s``    — the noop-sink run (bench.run_query) on a fresh frame.
- ``py4j_cmds`` — py4j commands sent during ONE fn() call (cProfile of
  java_gateway send_command), the driver-chatter counter motivating the
  parsed-SQL constructions (r14 opt; guide §5 "the driver should do
  almost no data work").
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from feature_store_healthcare_spark import queries as catalog  # noqa: E402
from feature_store_healthcare_spark.session import get_spark  # noqa: E402
from feature_store_healthcare_spark.sources import load_table  # noqa: E402


def py4j_commands(fn, spark, sf_dir) -> int:
    prof = cProfile.Profile()
    prof.enable()
    fn(spark, sf_dir)
    prof.disable()
    st = pstats.Stats(prof)
    total = 0
    for (filename, _lineno, funcname), (_cc, nc, _tt, _ct, _callers) in st.stats.items():
        if "java_gateway" in filename and funcname == "send_command":
            total += nc
    return total


def main() -> None:
    names = sys.argv[1].split(",")
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("fshs-profile")
    load_table(spark, sf_dir, "region").count()
    catalog.ensure_worker_imports(spark)
    qs = catalog.queries()
    entries = dict(
        [(nm, qs[nm]) for nm in bench.HEADLINE] + list(bench.EXTRA.items())
    )
    print("query\tbuild_s\tplan_s\texec_s\ttotal_s\tpy4j_cmds", flush=True)
    for name in names:
        fn = entries[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        bench.run_query(fn(spark, sf_dir))  # warm-up: index builds, JIT

        def best(step) -> float:
            b = None
            for _ in range(n):
                t0 = time.perf_counter()
                step()
                dt = time.perf_counter() - t0
                b = dt if b is None else min(b, dt)
            return b

        build_s = best(lambda: fn(spark, sf_dir))
        plan_s = best(lambda: fn(spark, sf_dir)._jdf.queryExecution().executedPlan())
        exec_s = best(lambda: bench.run_query(fn(spark, sf_dir)))
        cmds = py4j_commands(fn, spark, sf_dir)
        print(
            f"{name}\t{build_s:.3f}\t{plan_s - build_s:.3f}\t"
            f"{exec_s - plan_s:.3f}\t{exec_s:.3f}\t{cmds}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
