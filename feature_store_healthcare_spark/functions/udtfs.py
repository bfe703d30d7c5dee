"""Python UDTF surface (SURVEY.md §2.10).

The reference's extension hooks are dead config (``validation_rules`` /
``transformation_logic``, feature_registry.py:82,104 — never executed); the
registry makes those executable as SQL expressions.  This module covers the
remaining §2.10 surface: user-defined TABLE functions — one input row,
many output rows — registered for SQL ``LATERAL`` use.

UDTFs are the *slow path* by design (row-at-a-time Python): the engine's
hot-path tokenization is the codegen'd ``split``/``explode`` in
``operators.text`` / ``operators.dedup``.  A UDTF earns its cost only for
logic that genuinely can't be a column expression (external tokenizers,
stateful per-row expansion); the unit test pins the equivalence of
``TokenizeUdtf`` with the built-in path so the two can't drift.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="pos int, token string")
class TokenizeUdtf:
    """Whitespace tokenizer as a table function: emits (pos, token) per
    input text, after the same normalization as dedup.normalize_text
    (lowercase, collapse whitespace runs, trim)."""

    def eval(self, text: str | None):  # noqa: D102
        if text is None:
            return
        for pos, token in enumerate(text.lower().split()):
            yield pos, token


@udtf(returnType="n int, shingle string")
class ShingleUdtf:
    """Word n-gram shingle expansion as a table function: emits each
    distinct n-gram once (set semantics, like dedup.shingles).  ``n`` is a
    per-call scalar argument."""

    def eval(self, text: str | None, n: int):  # noqa: D102
        if text is None or n is None or n < 1:
            return
        toks = text.lower().split()
        seen: set[str] = set()
        for i in range(max(len(toks) - n, 0) + 1):
            sh = " ".join(toks[i : i + n])
            if sh not in seen:
                seen.add(sh)
                yield n, sh


def register_udtfs(spark: SparkSession) -> None:
    """Register the table functions for SQL use:

    ``SELECT d.doc_id, t.pos, t.token
      FROM documents d, LATERAL tokenize(d.text) t``
    """
    spark.udtf.register("tokenize", TokenizeUdtf)
    spark.udtf.register("shingle", ShingleUdtf)
