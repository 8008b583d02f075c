"""Frequent-item (heavy-hitter) detection at corpus scale.

The 100 TB problem: top-k over an ultra-high-cardinality key (URLs,
user ids, n-grams) where the full groupBy state is the cost. The
classic answer is two passes:

1. **Sketch pass** — per-partition Misra–Gries (space-saving)
   summaries with a fixed ``capacity`` of counters: one streaming scan,
   O(capacity) memory per partition, no shuffle of the raw keys. Every
   item with global count > N/capacity is guaranteed to survive in at
   least one partition summary (MG deletion bound, summed across
   partitions).
2. **Recount pass** — the candidate union (≤ capacity × partitions
   items — tiny) is exactly recounted via a broadcast semi-join, so
   reported counts are EXACT, not sketch estimates; only the candidate
   *selection* is approximate.

With ``capacity ≥`` the distinct-key count the sketch is lossless and
the result equals the exact groupBy top-k (the oracle configuration).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Window as W, functions as F


def heavy_hitters_exact(df: DataFrame, col: str, k: int = 10) -> DataFrame:
    """Exact top-k by count (ties → smallest value first): the
    baseline and the oracle for the sketch path."""
    counts = df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
    # top-k via orderBy+limit (TakeOrderedAndProject — per-partition
    # heaps, no single-partition window over ALL distinct terms, r10);
    # the rank column is then computed over the ≤k survivors only.
    top = counts.orderBy(F.desc("cnt"), F.asc(col)).limit(k)
    w = W.orderBy(F.desc("cnt"), F.asc(col))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def _misra_gries(values, capacity: int) -> dict:
    counters: dict = {}
    for v in values:
        if v in counters:
            counters[v] += 1
        elif len(counters) < capacity:
            counters[v] = 1
        else:
            dead = [key for key, c in counters.items() if c == 1]
            for key in dead:
                del counters[key]
            for key in list(counters):
                counters[key] -= 1
    return counters


def heavy_hitters(
    df: DataFrame, col: str, k: int = 10, capacity: int = 1024
) -> DataFrame:
    """Two-pass sketch top-k: Misra–Gries candidate generation per
    partition (``mapInPandas``, O(capacity) state, zero shuffle of raw
    keys) + exact recount of the candidate union.

    Returns ``(col, cnt, rank)`` — identical to
    :func:`heavy_hitters_exact` whenever every true top-k item appears
    in some partition summary (guaranteed for items with count >
    N/capacity; always true when ``capacity ≥`` distinct keys).
    """
    import pandas as pd

    def _sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            counters_update = _misra_gries(pdf[col].tolist(), capacity)
            # fold batch summaries into the partition summary with the
            # same MG eviction discipline
            for v, c in counters_update.items():
                counters[v] = counters.get(v, 0) + c
            if len(counters) > capacity:
                cut = sorted(counters.values())[len(counters) - capacity]
                counters = {
                    v: c - cut for v, c in counters.items() if c > cut
                }
        yield pd.DataFrame({col: list(counters.keys())})

    candidates = df.select(col).mapInPandas(
        _sketch, schema=df.select(col).schema
    ).distinct()
    recount = (
        df.join(F.broadcast(candidates), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # same TakeOrdered top-k as heavy_hitters_exact (r10): rank only
    # the ≤k survivors, never the full candidate set in one partition
    top = recount.orderBy(F.desc("cnt"), F.asc(col)).limit(k)
    w = W.orderBy(F.desc("cnt"), F.asc(col))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))
