"""Capture .explain("formatted") + job/exchange counts for every bench entry.

Usage: python tools/capture_plans.py <out_dir> [suffix] [only,names]

For each HEADLINE catalog query and EXTRA bench entry: build the frame
twice (first call pays any one-time stored-index build so the captured
plan is the steady-state probe), write the formatted plan to
``<out_dir>/<name>_<suffix>.txt``, run it once through the noop sink and
record the number of Spark jobs the run scheduled plus plan-shape
counters (Exchange / BatchEvalPython / ArrowEvalPython / sort-merge vs
broadcast joins).  The summary table lands in ``<out_dir>/summary_<suffix>.tsv``.
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from feature_store_healthcare_spark import queries as catalog  # noqa: E402
from feature_store_healthcare_spark.session import get_spark  # noqa: E402
from feature_store_healthcare_spark.sources import load_table  # noqa: E402


def formatted_plan(df) -> str:
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return qe.explainString(mode)


def plan_counts(plan: str) -> dict[str, int]:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "smj": len(re.findall(r"\bSortMergeJoin\b", plan)),
        "bhj": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
        "shj": len(re.findall(r"\bShuffledHashJoin\b", plan)),
        "py": len(re.findall(r"BatchEvalPython|ArrowEvalPython|MapInPandas", plan)),
        "sorts": len(re.findall(r"\bSort\b", plan)),
    }


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("fshs-plan-capture")
    load_table(spark, sf_dir, "region").count()
    catalog.ensure_worker_imports(spark)
    tracker = spark.sparkContext.statusTracker()

    qs = catalog.queries()
    todo = [(name, qs[name]) for name in bench.HEADLINE] + list(bench.EXTRA.items())
    if only is not None:
        todo = [(n, f) for n, f in todo if n in only]
    rows = []
    for name, fn in todo:
        spark.sparkContext.setJobDescription(name)
        fn(spark, sf_dir)  # warm: one-time index builds, JIT
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        build_s = time.perf_counter() - t0
        plan = formatted_plan(df)
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        jobs_before = len(tracker.getJobIdsForGroup(None))
        t0 = time.perf_counter()
        bench.run_query(df)
        wall = time.perf_counter() - t0
        n_jobs = len(tracker.getJobIdsForGroup(None)) - jobs_before
        c = plan_counts(plan)
        rows.append((name, round(wall, 3), n_jobs, round(build_s, 3), c))
        print(
            f"{name}\t{wall:.3f}s\tjobs={n_jobs}\tbuild={build_s:.3f}s\t"
            f"exch={c['exchanges']} smj={c['smj']} bhj={c['bhj']} "
            f"shj={c['shj']} py={c['py']} sorts={c['sorts']}",
            flush=True,
        )
    with open(os.path.join(out_dir, f"summary_{suffix}.tsv"), "w") as fh:
        fh.write("query\tnoop_wall_s\tn_jobs\tplan_build_s\texchanges\tsmj\tbhj\tshj\tpy\tsorts\n")
        for name, wall, n_jobs, build_s, c in rows:
            fh.write(
                f"{name}\t{wall}\t{n_jobs}\t{build_s}\t{c['exchanges']}\t"
                f"{c['smj']}\t{c['bhj']}\t{c['shj']}\t{c['py']}\t{c['sorts']}\n"
            )
    spark.stop()


if __name__ == "__main__":
    main()
