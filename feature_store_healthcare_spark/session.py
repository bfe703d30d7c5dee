"""SparkSession construction and runtime configuration.

Two entry points:

- :func:`get_spark` builds a tuned local session (tests, bench).
- :func:`configure` applies the *runtime-settable* confs this engine relies
  on to an existing session.  The correctness driver constructs its own
  SparkSession, so every public query function calls ``configure(spark)``
  before touching data.  ``nanosAsLong`` stays set so *legacy*
  TIMESTAMP(NANOS) events files remain readable; the loader branches on the
  actual inferred column type (sources/tables.py).

Scale notes (100 TB design point): these settings assume local[$CPUS] for
testing; on a real cluster the same code runs unchanged, with
``spark.sql.shuffle.partitions`` sized to ~2-3× total cores and AQE coalescing
partitions at runtime.  AQE also handles skew-join splitting, which matters
for the EAV long table where hot entities are common.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs applied to any session (including the driver's).
RUNTIME_CONFS: dict[str, str] = {
    # Legacy events.parquet generators used TIMESTAMP(NANOS,false), which
    # Spark can only read as long (it has no nanos type); current testdata is
    # TIMESTAMP(MICROS,false).  tables.load_table branches on the inferred
    # column type, so this conf only affects genuinely-nanos files.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic timestamp semantics against the DuckDB oracle (naive UTC).
    "spark.sql.session.timeZone": "UTC",
    # Runtime re-planning: partition coalescing, skew-join splitting,
    # broadcast-join conversion once actual sizes are known.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # parallelismFirst stays at its default (true).  The r14 optimization
    # round A/B-ed `false` (the docs' respect-the-advisory-size posture)
    # across the full bench: NET LOSS at sf0.1 — this engine's hot stages
    # are compute-dense but byte-light (64-dim scoring folds, shingle
    # pair generation, per-vocab merge folds), and coalescing them to the
    # 64 MB advisory serialized real CPU work (embedding_near_dup_lsh
    # 1.3→2.2 s, dedup_ngram_jaccard 1.5→2.1 s) while byte-heavy stages
    # were unaffected.  Details in OPTIMIZATION_r14.md.
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Runtime row-level filtering for shuffle joins between large tables
    # (fact⋈fact at 100 TB): build a bloom filter from the selective side's
    # join keys and push it into the other side's scan — the runtime
    # complement of static predicate pushdown.  Explicit, not default-
    # dependent, because the 100 TB plans rely on it.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
}


#: applicationIds this process has already configured — configure() is
#: called by every load_table/public query entry, and the ~7 conf.set
#: py4j round trips measured ~35 ms per call (r14 opt: ~240 calls per
#: bench run ≈ seconds of pure driver chatter).  The confs are
#: process-stable, so one application is configured once.
_CONFIGURED_APPS: set[str] = set()


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (idempotent; applied
    once per application — see _CONFIGURED_APPS)."""
    try:
        app = spark.sparkContext.applicationId
        if app in _CONFIGURED_APPS:
            return spark
    except Exception:
        app = None
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # Conf not settable at runtime in this build — proceed; the
            # events loader branches on the inferred type, so only legacy
            # nanos files would be affected.
            pass
    # Right-size the shuffle width when the session still carries Spark's
    # stock 200: 2× the cluster's cores (the standard sizing; SCALE.md).
    # On a bare driver-like local[N] session, 200-task stages over small
    # shuffles dominate wall-clock (measured 2× on the iterative pagerank
    # rounds, where eager checkpoints materialize every stage).  An
    # explicitly-set value (e.g. get_spark's, or a user's) is respected —
    # only the untouched default is replaced.
    try:
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            cores = spark.sparkContext.defaultParallelism
            spark.conf.set("spark.sql.shuffle.partitions", str(2 * cores))
    except Exception:
        pass
    if app is not None:
        _CONFIGURED_APPS.add(app)
    return spark


def get_spark(
    app_name: str = "feature-store-healthcare-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build a tuned SparkSession for local testing / benchmarking.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    for key, value in RUNTIME_CONFS.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    return configure(spark)
