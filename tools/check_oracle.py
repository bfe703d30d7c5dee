"""Local replica of the driver's correctness gate.

Runs every catalog query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names and (column-name-sorted,
row-sorted) values.  Exact comparison for everything except floats, which get
a tiny relative tolerance *reported separately* — the goal is bit-identical,
so any float needing tolerance is flagged.

Two driver-faithfulness rules (both burned us in round 1):

- The SparkSession is VANILLA — no tuned confs at build time, exactly like
  the driver's.  Whatever a query needs must be set by the query itself via
  ``session.configure``.  Never check against ``get_spark``'s tuned session.
- DuckDB results are fetched through Arrow, so noncanonical result types
  surface: a HUGEINT (``SUM(BIGINT)``) becomes Decimal and FAILS the exact
  compare against Spark's int.  If this flags a query, fix the oracle SQL
  (``CAST(... AS BIGINT)``), not this checker.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from feature_store_healthcare_spark import queries as catalog  # noqa: E402
from feature_store_healthcare_spark.sources import TABLE_NAMES  # noqa: E402


def vanilla_spark() -> SparkSession:
    """A driver-like bare session: master only, no engine confs."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("oracle-check")
        .getOrCreate()
    )


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def canon(value):
    if isinstance(value, float):
        return ("f", value)
    return value


def rows_key(row):
    return tuple(
        (x is None, "" if x is None else str(type(x).__name__), str(x)) for x in row
    )


def compare(name: str, spark_rows, spark_cols, duck_rows, duck_cols) -> list[str]:
    problems = []
    if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in duck_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(spark_rows) != len(duck_rows):
        problems.append(f"row count: spark={len(spark_rows)} duck={len(duck_rows)}")
    # reorder columns by sorted name
    s_order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i].lower())
    d_order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i].lower())
    s = sorted([tuple(r[i] for i in s_order) for r in spark_rows], key=rows_key)
    d = sorted([tuple(r[i] for i in d_order) for r in duck_rows], key=rows_key)
    n_exact = 0
    n_close = 0
    for i, (sr, dr) in enumerate(zip(s, d)):
        for j, (sv, dv) in enumerate(zip(sr, dr)):
            if sv == dv or (sv is None and dv is None):
                n_exact += 1
                continue
            if (
                isinstance(sv, float)
                and isinstance(dv, float)
                and math.isclose(sv, dv, rel_tol=1e-9, abs_tol=1e-12)
            ):
                n_close += 1
                continue
            problems.append(
                f"value mismatch row {i} col {sorted(spark_cols, key=str.lower)[j]}: "
                f"spark={sv!r} duck={dv!r}"
            )
            if len(problems) > 5:
                return problems
    if n_close:
        problems.append(f"FLOAT-TOLERANCE USED on {n_close} cells (want bit-identical)")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = vanilla_spark()
    con = duck_connection(sf_dir)
    qs = catalog.queries()
    oracles = catalog.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failed.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spark_rows)} rows (no oracle)")
            continue
        try:
            tbl = con.execute(oracles[name]).arrow()
            duck_cols = list(tbl.column_names)
            pylists = [c.to_pylist() for c in tbl.columns]
            duck_rows = list(zip(*pylists)) if pylists else []
        except Exception as e:
            failed.append(name)
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            continue
        problems = compare(name, spark_rows, spark_cols, duck_rows, duck_cols)
        dt = time.time() - t0
        if problems:
            failed.append(name)
            print(f"FAIL  {name} ({dt:.1f}s, {len(spark_rows)} rows)")
            for p in problems:
                print(f"      {p}")
        else:
            print(f"ok    {name} ({dt:.1f}s, {len(spark_rows)} rows)")
    n_run = sum(1 for n in qs if not only or n in only)
    print(f"\n{n_run - len(failed)}/{n_run} queries match at {sf_dir}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
