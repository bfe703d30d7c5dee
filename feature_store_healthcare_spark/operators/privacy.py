"""PHI/PII detection, masking and retention operators (HIPAA surface).

The reference's whole premise is PHI governance — features carry a
``phi_level`` and ACL roles (feature_registry.py:133-135, :469-475) and
values a 7-year retention (``retention_days = 2555``,
feature_registry.py:136) — but it never inspects *content*: a STRING
feature value containing an SSN flows through unredacted.  This module adds
the content-level half of that story as engine operators:

- :func:`phi_hit_counts` / :func:`scrub_text`: regex detection and masking
  of identifier patterns (SSN, phone, MRN-style digit runs, email, dates).
  Pure ``regexp_count`` / ``regexp_replace`` column expressions — JVM-side,
  whole-stage codegen, no UDFs — so scrubbing a 100 TB corpus is a single
  scan-shaped map with full predicate/column pushdown underneath.
Retention enforcement (the governance sibling of scrubbing) lives in
:mod:`feature_store_healthcare_spark.maintenance` — per-feature
``retention_filter``/``apply_retention`` and the fixed-cutoff
``retention_split`` classifier.

Patterns are deliberately written in the portable intersection of Java
regex (Spark) and RE2 (DuckDB oracle): character classes, bounded repeats,
alternation — no backrefs, no lookaround.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Detection/masking patterns, applied IN ORDER (order matters: the SSN
#: pattern must run before the shorter phone pattern that its tail would
#: otherwise match).  label → (regex, replacement token).
PHI_PATTERNS: dict[str, tuple[str, str]] = {
    "ssn": (r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "[SSN]"),
    "phone": (r"[0-9]{3}-[0-9]{4}", "[PHONE]"),
    "mrn": (r"[0-9]{9}", "[MRN]"),
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+", "[EMAIL]"),
    "date": (r"[0-9]{4}/[0-9]{2}/[0-9]{2}", "[DATE]"),
}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def phi_hit_counts(text: Column | str, patterns: dict[str, tuple[str, str]] | None = None) -> dict[str, Column]:
    """Per-pattern match counts for one text column.

    Counts are taken against the *progressively scrubbed* text, mirroring
    :func:`scrub_text`'s sequential replacement — so a digit run consumed by
    the SSN mask is not double-counted by the phone or MRN patterns.
    Returns ``{label: Column}`` (callers alias as ``n_{label}``).
    """
    patterns = patterns or PHI_PATTERNS
    counts: dict[str, Column] = {}
    cur = _col(text)
    for label, (rx, repl) in patterns.items():
        counts[label] = F.regexp_count(cur, F.lit(rx))
        cur = F.regexp_replace(cur, rx, repl)
    return counts


def scrub_text(text: Column | str, patterns: dict[str, tuple[str, str]] | None = None) -> Column:
    """Mask every PHI pattern in ``text``, applying patterns in dict order."""
    patterns = patterns or PHI_PATTERNS
    cur = _col(text)
    for _, (rx, repl) in patterns.items():
        cur = F.regexp_replace(cur, rx, repl)
    return cur


def scrub_documents(
    df: DataFrame, text_col: str, patterns: dict[str, tuple[str, str]] | None = None
) -> DataFrame:
    """Scrubbed copy of ``df`` plus ``n_{label}`` hit-count columns and a
    ``phi_total`` rollup.  One narrow projection — no shuffle, no UDF."""
    patterns = patterns or PHI_PATTERNS
    counts = phi_hit_counts(F.col(text_col), patterns)
    out = df.withColumns({f"n_{label}": c for label, c in counts.items()})
    total = None
    for label in patterns:
        c = F.col(f"n_{label}")
        total = c if total is None else total + c
    return out.withColumn("phi_total", total).withColumn(
        text_col, scrub_text(F.col(text_col), patterns)
    )
