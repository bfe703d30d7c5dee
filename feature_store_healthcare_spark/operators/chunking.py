"""Document chunking for retrieval / context-window pipelines (SURVEY.md
§2.11 extension; BASELINE.json:6 — "LLM training-data pipeline" surface).

Splits each document into fixed-size token windows with overlap — the
standard RAG / embedding-indexing preprocessing step.  The reference has no
chunking (its documents are opaque strings, feature_registry.py:97-114); at
100 TB this is a core corpus operator: every chunk feeds the embedding and
dedup stages downstream.

Plan shape: tokenize → ``sequence``/``explode`` row expansion → ``slice``
per chunk.  No shuffle, no UDF — the expansion happens inside whole-stage
codegen on the scan partitioning, so a 100 TB corpus chunks in one pass and
the output inherits the input's partitioning (chunks of one doc stay
co-located for the downstream per-doc rollups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from feature_store_healthcare_spark.operators.dedup import normalize_text


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    overlap_tokens: int = 16,
) -> DataFrame:
    """Fixed-size overlapping token-window chunks per document.

    Windows start every ``stride = chunk_tokens - overlap_tokens`` tokens;
    the last window may be shorter (never empty).  A doc with
    ``n <= chunk_tokens`` tokens yields exactly one chunk.  Empty docs
    yield one empty chunk (tokenization of "" is [""] — kept, matching
    the corpus token-count convention elsewhere in the engine).

    Output: (id_col, chunk_idx, n_chunks, token_start, chunk_token_count,
    chunk_text).  ``token_start`` is 0-based; reconstruction invariant:
    dropping the first ``overlap_tokens`` of every chunk but the first and
    concatenating restores the normalized document.
    """
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError("need 0 <= overlap_tokens < chunk_tokens")
    stride = chunk_tokens - overlap_tokens
    toks = F.split(normalize_text(text_col), " ")
    n = F.size(toks)
    # number of stride-steps needed to cover the tail past the first window
    n_chunks = (
        F.lit(1)
        + F.ceil(F.greatest(n - F.lit(chunk_tokens), F.lit(0)) / F.lit(stride))
    ).cast("int")
    base = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        n.alias("__n"),
        n_chunks.alias("n_chunks"),
    )
    start = F.col("chunk_idx") * F.lit(stride)
    return (
        base.select(
            F.col(id_col),
            F.col("__toks"),
            F.col("__n"),
            F.col("n_chunks"),
            F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_idx"),
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx"),
            F.col("n_chunks"),
            start.alias("token_start"),
            F.least(F.lit(chunk_tokens), F.col("__n") - start).alias(
                "chunk_token_count"
            ),
            F.array_join(F.slice(F.col("__toks"), start + 1, chunk_tokens), " ").alias(
                "chunk_text"
            ),
        )
    )
