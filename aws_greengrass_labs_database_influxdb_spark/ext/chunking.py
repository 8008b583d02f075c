"""Document chunking + sequence packing — the steps between a cleaned
corpus and fixed-length training batches.

Scale design:

- **chunk_documents**: pure Column pipeline (split → sequence →
  posexplode → slice → array_join) — no shuffle at all; output size is
  Σ ceil(len/stride) rows, produced map-side. At 100 TB this is the
  same embarrassingly-parallel shape as any map stage.
- **pack_sequences**: deterministic contiguous packing *within a
  partition key* (default: ``source``). A single global cumulative sum
  would serialize on one task at scale; per-key packing keeps the
  window shuffle bounded by the key's row count and is what real
  pipelines do anyway (pack within shard, never across). The output
  (pack_id, pack_offset) is reproducible run-to-run — the property
  that matters for resumable dataset builds.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W, functions as F


def _tokens(text_col: str):
    # whitespace tokens, same normalization recipe as ext.dedup shingles
    return F.split(
        F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")), " "
    )


def chunk_documents(
    df: DataFrame,
    size: int,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into token-window chunks of ``size`` tokens
    every ``stride`` tokens (stride < size → overlapping windows, the
    long-context training idiom). Returns ``(id, chunk_id, chunk_text,
    n_tokens)`` — one row per chunk, map-side only.
    """
    if stride is None:
        stride = size
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")
    toks = _tokens(text_col)
    n = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    exploded = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.posexplode(starts).alias("chunk_id", "_start"),
    )
    chunk = F.slice(F.col("_toks"), F.col("_start") + 1, size)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).cast("long").alias("n_tokens"),
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    by: Sequence[str] = ("source",),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences by
    contiguous fill in ``id_col`` order within each ``by`` partition:
    ``pack_id = floor(running_prior_tokens / budget)``,
    ``pack_offset = running_prior_tokens % budget``.

    Deterministic and shuffle-bounded: the cumulative sum runs per
    partition key, never globally. A document longer than ``budget``
    still gets a slot (real pipelines chunk first — compose with
    :func:`chunk_documents`).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    by = list(by)
    n_tok = F.size(_tokens(text_col)).cast("long")
    w = (
        W.partitionBy(*by)
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    with_tok = df.select(*by, F.col(id_col), n_tok.alias("n_tokens"))
    cum_prev = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return with_tok.select(
        *by,
        id_col,
        "n_tokens",
        F.floor(cum_prev / budget).cast("long").alias("pack_id"),
        (cum_prev % budget).cast("long").alias("pack_offset"),
    )
