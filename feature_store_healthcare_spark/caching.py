"""Session-lifecycle cache policy for operator-internal ``persist()`` calls.

Several operators persist an intermediate that feeds multiple consumers in
the SAME query (an LSH band table joins itself; the BM25 single-scan base
feeds postings, document frequency, and corpus stats).  A bare per-call
``persist()`` has the right plan shape but the wrong lifecycle: a
long-lived ingest session calling the operator per batch accumulates one
cached corpus-sized table per call, because nothing ever unpersists the
predecessor (Spark's cache manager drops *blocks* under memory pressure
but never unregisters the entry).

:class:`PlanCache` is the module standard (round 6 proved it on
``bm25_topk``; round 7 applies it everywhere):

- **one entry per call site** — admitting a new plan releases the
  predecessor, capping the session footprint at one cached table per
  operator instead of one per call;
- **reuse on semantic equality** — a repeat call on the same corpus with
  the same parameters (bench reruns, oracle checks, a probe retried after
  a tripwire raise) gets the already-cached table back, preserving what
  Spark's ``CacheManager`` used to do implicitly for identical persisted
  plans;
- **hash-then-confirm** — equality is the analyzed plan's 32-bit
  ``semanticHash`` CONFIRMED by ``sameResult``, never the hash alone: a
  colliding hash between two different (corpus, parameter) plans must
  rebuild, not silently serve one corpus's cached rows to another.
  Spark's own ``CacheManager.lookupCachedData`` uses the same
  hash-bucket-then-``sameResult`` discipline.

``unpersist()`` only drops cached blocks: an older, still-unmaterialized
result recomputes from lineage — release is a cost event, never a
correctness event.

Staleness contract: ``sameResult`` compares PLANS, so a plan whose
underlying path gained files mid-session still matches — which is why
every operator call site passes a ``version`` token
(:func:`data_version` of its INPUT scan): a re-read that picks up new
files produces a new token, the stale entry is released, and both the
cached rows and any memoized estimates derived from them refresh.  The
``release_*`` hooks remain for eager memory reclamation.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame

_log = logging.getLogger(__name__)


class PlanCache:
    """One-entry persisted-DataFrame cache keyed by analyzed-plan identity
    (semanticHash bucket, sameResult confirmation — see module docstring).
    """

    def __init__(self, name: str):
        self.name = name
        # (semanticHash, analyzed LogicalPlan, persisted DataFrame, version)
        self._entry: tuple[int, object, DataFrame, object] | None = None
        self._hit_check_warned = False

    def get_or_persist(self, df: DataFrame, version: object = None) -> DataFrame:
        """Return the cached DataFrame when ``df`` is semantically equal to
        the cached plan; otherwise release the predecessor, persist ``df``
        and cache it.  The returned frame is always persisted (lazily —
        materialized by its first action, e.g. an auto-sizing count).

        ``version``: optional input-data version token (typically
        :func:`data_version` of the operator's INPUT scan).  ``sameResult``
        compares PLANS, which stay equal when the underlying path gains
        files — so without a version token a grown corpus would keep
        serving the pre-growth cached rows.  A version mismatch demotes to
        a miss: the stale entry is released and the fresh plan persisted.

        Never served: an entry from a DIFFERENT SparkSession (module-level
        caches outlive sessions in one Python process — a frame whose
        session was stopped throws on first use), an entry whose cached
        blocks were EVICTED externally (``spark.catalog.clearCache()``
        unpersists everything but this cache would otherwise keep
        returning the now-uncached frame forever, silently losing the
        compute-once guarantee), and a stale JVM handle that errors during
        comparison."""
        plan = df._jdf.queryExecution().analyzed()
        key = plan.semanticHash()
        if self._entry is not None:
            ekey, eplan, edf, eversion = self._entry
            try:
                # hash first (cheap), sameResult to confirm (a 32-bit
                # collision between different plans must MISS, not serve
                # foreign rows)
                sl = edf.storageLevel
                if (
                    edf.sparkSession is df.sparkSession
                    and (sl.useMemory or sl.useDisk)
                    and eversion == version
                    and ekey == key
                    and eplan.sameResult(plan)
                ):
                    return edf
            except Exception as exc:
                # Expected only for a dead gateway object from a stopped
                # session (py4j/connection errors) → treat as miss.  Any
                # OTHER comparison error is a bug (e.g. a sameResult
                # regression) being demoted to a permanent per-call miss —
                # log it once per cache so it is observable, not silent.
                if not self._hit_check_warned:
                    self._hit_check_warned = True
                    _log.warning(
                        "PlanCache[%s] hit check raised %s: %s — treating "
                        "as a miss; if this is not a stopped-session py4j "
                        "error, every call is rebuilding the cached plan",
                        self.name,
                        type(exc).__name__,
                        exc,
                    )
            self.release()
        cached = df.persist()
        self._entry = (key, plan, cached, version)
        return cached

    def peek(self) -> DataFrame | None:
        """The currently cached frame, if any (tests / diagnostics)."""
        return self._entry[2] if self._entry is not None else None

    def release(self, blocking: bool = False) -> None:
        """Unpersist and forget the cached entry now (idempotent).
        Best-effort by contract: if the owning session is already
        stopped, its cached blocks died with it — forget the entry."""
        if self._entry is not None:
            try:
                self._entry[2].unpersist(blocking=blocking)
            except Exception:
                pass
            self._entry = None


class BoundedMemo(dict):
    """Insertion-ordered dict capped at ``maxsize`` — the container for
    the tripwire-estimate memos.  Each (plan, data-version) pair admits
    one small scalar, but an ingest loop mints a NEW version key per
    batch (that is the point of :func:`data_version`), so an unbounded
    dict grows by one entry per batch forever — the same
    session-lifecycle leak class PlanCache exists to prevent, just in
    miniature.  Admitting a key beyond the cap evicts the OLDEST entry;
    an evicted estimate simply recomputes (a cost event, never a
    correctness event — identical to PlanCache's release semantics).
    ``clear()`` is the eager hook, called by the operators'
    ``release_*`` functions."""

    def __init__(self, maxsize: int = 256):
        super().__init__()
        self.maxsize = maxsize

    def __setitem__(self, key, value):
        if key not in self and len(self) >= self.maxsize:
            del self[next(iter(self))]
        super().__setitem__(key, value)


#: Above this many leaf files the exact path-list hash would ship every
#: path through py4j (~0.2 s / 1.5k files, linear — minutes at a
#: 100 TB table's ~1M files), so data_version switches to an O(1)
#: (file count, total bytes) token instead.
_EXACT_VERSION_MAX_FILES = 1024


def data_version(df: DataFrame) -> int:
    """Cheap input-version signal for memo keys, derived from the plan's
    leaf input files (listing only — never reads data).

    A plan's ``semanticHash`` does NOT change when more data appears under
    an unchanged path (appended parquet files, a grown bucketed table), so
    a memo keyed on the plan alone goes stale exactly when an incremental
    pipeline grows its own corpus (``append_band_index`` does this by
    design).  Folding a file-level signal in makes the memo re-estimate
    after any append that a fresh read picks up.

    Two tiers, because the obvious implementation does not survive 100 TB:
    hashing the sorted path list is exact but transfers every path
    driver-side through py4j — measured ~0.2 s per 1.5k files and linear,
    i.e. minutes per call on a ~1M-file table.  Up to
    ``_EXACT_VERSION_MAX_FILES`` leaf files (the file COUNT is read with
    an O(1) array-length call, no path transfer) the exact hash is used;
    beyond it the token is ``(n_files, total bytes from the relation's
    statistics)`` — two O(1) JVM calls against metadata the file index
    already holds (measured ~4 ms at 5k files, size-independent).  An
    append changes the count and almost always the byte total; the case
    the cheap tier can miss — an in-place rewrite with identical file
    count AND identical total bytes — also defeats Spark's own cached
    ``persist()``, so callers re-ingesting that way must call the
    operator's ``release_*`` hook regardless of this signal.

    The token is PROCESS-LOCAL by construction: both tiers go through
    Python's ``hash()``, whose string hashing is salted per interpreter
    (PYTHONHASHSEED), so the same table yields a different token in a
    different process — correct for the in-process memos and PlanCache
    entries this feeds (none outlive the interpreter), but never persist
    or compare a token across processes.

    Limits, documented rather than hidden: the signal reflects the file
    index captured when ``df``'s relation was RESOLVED — a caller that
    keeps one DataFrame object across external appends may see the stale
    list (re-read the path to refresh), and non-file sources (in-memory
    relations) version as the constant empty list.  Version the operator's
    INPUT frame, never a plan the operator itself persists: cache
    substitution rewrites any plan matching a persisted one to its
    InMemoryRelation, whose ``inputFiles()`` is empty.
    """
    jarr = df._jdf.inputFiles()  # py4j array proxy; len() is O(1)
    if len(jarr) <= _EXACT_VERSION_MAX_FILES:
        # materialize the proxy we already hold — a df.inputFiles() call
        # here would rebuild the listing array on the JVM a second time
        return hash(tuple(sorted(list(jarr))))
    size = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    return hash((len(jarr), str(size)))


def release_local_checkpoint(df: DataFrame, blocking: bool = False) -> None:
    """Free an eager ``localCheckpoint``'s storage blocks NOW.

    ``Dataset.unpersist()`` does NOT do this: it unregisters cached-query
    entries from the ``CacheManager``, but a localCheckpoint's blocks are
    persisted on the internal checkpointed RDD, which the CacheManager
    never sees — measured empirically (round-10 ADVICE):
    ``getRDDStorageInfo`` still lists every block after
    ``Dataset.unpersist(true)``, and the blocks linger until the JVM
    happens to GC the RDD reference.  Iterative operators that
    re-checkpoint per round (connected components, PageRank, the BPE
    trainer) would otherwise hold every round's full state copy.

    The checkpointed RDD is reachable through the analyzed plan — an
    eager localCheckpoint returns a Dataset whose plan IS a ``LogicalRDD``
    wrapping it — so unpersisting THAT RDD releases the blocks
    immediately (verified: storage info drops to empty).  Best-effort by
    design: on a frame that is not a materialized localCheckpoint this is
    a silent no-op, and a py4j surface change degrades to the old
    GC-eventually behavior rather than failing the computation.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(blocking)
    except Exception:
        pass
