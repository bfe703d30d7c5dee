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

from pyspark.sql import DataFrame


class PlanCache:
    """One-entry persisted-DataFrame cache keyed by analyzed-plan identity
    (semanticHash bucket, sameResult confirmation — see module docstring).
    """

    def __init__(self, name: str):
        self.name = name
        # (semanticHash, analyzed LogicalPlan, persisted DataFrame, version)
        self._entry: tuple[int, object, DataFrame, object] | None = None

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
            except Exception:
                pass  # dead gateway object from a stopped session → miss
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


def data_version(df: DataFrame) -> int:
    """Cheap input-version signal for memo keys: a hash of the plan's leaf
    input files (path + name per file — listing only, no data read).

    A plan's ``semanticHash`` does NOT change when more data appears under
    an unchanged path (appended parquet files, a grown bucketed table), so
    a memo keyed on the plan alone goes stale exactly when an incremental
    pipeline grows its own corpus (``append_band_index`` does this by
    design).  Folding the file list in makes the memo re-estimate after
    any append that a fresh read picks up.

    Limits, documented rather than hidden: the signal reflects the file
    index captured when ``df``'s relation was RESOLVED — a caller that
    keeps one DataFrame object across external appends may see the stale
    list (re-read the path to refresh), and non-file sources (in-memory
    relations) version as the constant empty list.  Version the operator's
    INPUT frame, never a plan the operator itself persists: cache
    substitution rewrites any plan matching a persisted one to its
    InMemoryRelation, whose ``inputFiles()`` is empty.
    """
    return hash(tuple(sorted(df.inputFiles())))
