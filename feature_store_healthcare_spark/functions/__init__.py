"""Scalar column functions (SURVEY.md §2.8, OP-33..OP-42).

Each function returns a Spark Column built only from JVM-side built-ins —
no Python UDFs — so every expression participates in whole-stage codegen
and can be pushed into Catalyst plans.

Reference parity (all cites into /root/reference):
- feature/group/cache id generation: feature_registry.py:617-630,
  feature_server.py:470-479 (sha256 of colon-joined key, hex prefix).
- freshness classification: feature_server.py:585-594 (3-way CASE on age
  against freshness_sla_seconds=3600 / stale_threshold_seconds=86400).
- store key: feature_server.py:428, :502 (f"{entity_type}:{entity_id}").
- ACL role overlap: feature_registry.py:470 (any role in access_roles).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

FRESHNESS_SLA_SECONDS = 3_600  # fresh→stale (feature_server.py:107)
STALE_THRESHOLD_SECONDS = 86_400  # stale→expired (feature_server.py:108)


def _as_col(value: Column | str) -> Column:
    return value if isinstance(value, Column) else F.col(value)


def sha_id(prefix: str, *parts: Column | str, length: int = 16) -> Column:
    """``{prefix}{sha256(":".join(parts))[:length]}`` — content-hash ids.

    Mirrors feature_registry.py:617-625 (feat_/16) and :627-630 (grp_/12).
    """
    joined = F.concat_ws(":", *[_as_col(p) for p in parts])
    return F.concat(F.lit(prefix), F.substring(F.sha2(joined, 256), 1, length))


def feature_id(name: Column | str, version: Column | str, entity_type: Column | str) -> Column:
    return sha_id("feat_", name, version, entity_type, length=16)


def group_id(name: Column | str, entity_type: Column | str) -> Column:
    return sha_id("grp_", name, entity_type, length=12)


def store_key(entity_type: Column | str, entity_id: Column | str) -> Column:
    """Online-store key ``{entity_type}:{entity_id}`` (feature_server.py:428)."""
    return F.concat_ws(":", _as_col(entity_type), _as_col(entity_id).cast("string"))


def cache_key(
    entity_type: Column | str, entity_id: Column | str, feature_names: Column | str
) -> Column:
    """sha256 of ``entity_type:entity_id:sorted(names)`` (feature_server.py:470-479).

    ``feature_names`` is an array column; sorted canonically before hashing.
    """
    names = F.array_join(F.array_sort(_as_col(feature_names)), ",")
    joined = F.concat_ws(
        ":", _as_col(entity_type), _as_col(entity_id).cast("string"), names
    )
    return F.sha2(joined, 256)


def age_micros(ts: Column | str, now: Column | str) -> Column:
    """Microseconds elapsed between ``ts`` and ``now``
    (feature_server.py:151,:587 uses total_seconds(); we keep exact µs to
    avoid truncation ambiguity at the SLA boundaries).  Works for both
    TIMESTAMP and TIMESTAMP_NTZ inputs (session timezone is pinned UTC)."""
    return F.unix_micros(_as_col(now).cast("timestamp")) - F.unix_micros(
        _as_col(ts).cast("timestamp")
    )


def freshness(
    ts: Column | str,
    now: Column | str,
    fresh_seconds: int = FRESHNESS_SLA_SECONDS,
    stale_seconds: int = STALE_THRESHOLD_SECONDS,
) -> Column:
    """3-way freshness CASE (feature_server.py:585-594).

    NULL timestamp (missing feature) → 'expired', matching the null-fill
    path at feature_server.py:520-527.
    """
    age = age_micros(ts, now)
    return (
        F.when(_as_col(ts).isNull(), F.lit("expired"))
        .when(age <= fresh_seconds * 1_000_000, F.lit("fresh"))
        .when(age <= stale_seconds * 1_000_000, F.lit("stale"))
        .otherwise(F.lit("expired"))
    )


def roles_overlap(access_roles: Column | str, user_roles: Sequence[str]) -> Column:
    """ACL check: user holds at least one of the feature's access roles
    (feature_registry.py:470).  Empty user role set → false."""
    if not user_roles:
        return F.lit(False)
    return F.arrays_overlap(
        _as_col(access_roles), F.array(*[F.lit(r) for r in user_roles])
    )


def acl_allowed(
    phi_level: Column | str, access_roles: Column | str, user_roles: Sequence[str]
) -> Column:
    """PHI features require role overlap; non-PHI is open
    (feature_registry.py:469-475: the gate only fires when phi_level != none)."""
    return (_as_col(phi_level) == "none") | roles_overlap(access_roles, user_roles)


def json_long(col: Column | str, path: str) -> Column:
    """Extract an integer JSON field (driver events.props, OP-42)."""
    return F.get_json_object(_as_col(col), path).cast("long")


# -- PHI/PII text redaction (engine extension of the PHI model,
#    feature_registry.py:286 phi_level; applied to free-text columns) ------

#: (pattern, replacement) pairs applied in order.  Java-regex syntax that
#: is also valid RE2, so the same patterns run engine-side and in audits.
PHI_PATTERNS: list[tuple[str, str]] = [
    # emails before phones: an email's digits must not be half-redacted
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    (r"(?:\+?1[-. ])?\(?\b\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b", "[PHONE]"),
    (r"\bMRN[:# ]?\s*\d{6,10}\b", "[MRN]"),
    (r"\b\d{4}-\d{2}-\d{2}\b", "[DATE]"),
]


def redact_phi(text: Column | str, patterns: Sequence[tuple[str, str]] | None = None) -> Column:
    """Replace PHI-shaped spans (emails, SSNs, phone numbers, MRN ids,
    ISO dates) with bracketed placeholders.  Pure chained
    ``regexp_replace`` — JVM-side, codegen-friendly, no UDF — so it can
    run inside the same projection as quality gates over a 100 TB corpus.
    Pattern order matters (emails first so their digits are not split by
    the phone rule); pass ``patterns`` to extend or restrict the set."""
    c = _as_col(text)
    for pat, repl in patterns or PHI_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def phi_hit_count(text: Column | str, patterns: Sequence[tuple[str, str]] | None = None) -> Column:
    """How many PHI-shaped spans the redactor would replace — the audit
    metric for a redaction pass (0 means the text is clean)."""
    c = _as_col(text)
    total = F.lit(0)
    for pat, _ in patterns or PHI_PATTERNS:
        total = total + F.regexp_count(c, F.lit(pat))
    return total
