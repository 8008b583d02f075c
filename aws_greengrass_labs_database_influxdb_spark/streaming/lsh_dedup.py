"""Streaming near-duplicate rejection: incremental MinHash-LSH against
a persisted signature store.

The batch LSH (``ext.dedup.minhash_lsh_pairs``) answers "which pairs in
THIS corpus are near-dups"; a continuous crawl needs the other shape:
"is this incoming document a near-dup of anything we already kept?"
This stage maintains a parquet store of (band, band_hash) buckets for
every document ever admitted, and per micro-batch:

1. computes MinHash band hashes for the batch (one shingle pass, all
   JVM-side — the same signature recipe as the batch operator, so batch
   and streaming agree on what "near-dup" means);
2. drops documents whose ANY band bucket already exists in the store
   (near-dup of an admitted doc), and resolves in-batch collisions by
   min-id (deterministic winner, same rule as batch span dedup);
3. appends the survivors' band hashes to the store.

Scale: the store is ``admitted_docs × bands`` fixed-width rows — a
(band, hash) semi-join keyed uniformly by hash, so the probe shuffles
only the BATCH side against a bucketed read of the store; the corpus
itself is never rescanned. State grows with *admitted* (post-dedup)
volume, the floor for any exact-memory dedup. For bounded-horizon
semantics compose with ``stream_exact_dedup``'s watermark instead.

Used through ``foreachBatch`` (the store append must be transactional
per batch); ``process_batch`` is the same logic exposed for batch
backfills and tests.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..ext.dedup import minhash_signatures


class LshDedupStore:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        n: int = 3,
        num_hashes: int = 32,
        bands: int = 8,
        text_col: str = "text",
        id_col: str = "doc_id",
    ):
        if num_hashes % bands:
            raise ValueError("bands must divide num_hashes")
        self.spark = spark
        self.root = root
        self.n, self.num_hashes, self.bands = n, num_hashes, bands
        self.text_col, self.id_col = text_col, id_col

    # ------------------------------------------------------------ internals

    def _band_hashes(self, df: DataFrame) -> DataFrame:
        """(id, band, bhash) — one row per (doc, band)."""
        rpb = self.num_hashes // self.bands
        sig = minhash_signatures(
            df, self.n, self.num_hashes, self.text_col, self.id_col
        )
        bands = F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.col(f"mh_{b * rpb + r}") for r in range(rpb)], F.lit(b)
                ).alias("bhash"),
            )
            for b in range(self.bands)
        ])
        return sig.select(
            self.id_col, F.explode(bands).alias("_b")
        ).select(self.id_col, "_b.band", "_b.bhash")

    def _known(self) -> DataFrame | None:
        if not os.path.exists(self.root):
            return None
        return self.spark.read.parquet(self.root)

    # ------------------------------------------------------------ public

    def process_batch(self, batch: DataFrame) -> DataFrame:
        """Admit the batch's non-near-dups and record their signatures.
        Returns the admitted (surviving) rows of ``batch``."""
        bh = self._band_hashes(batch).persist()
        try:
            drop = None
            known = self._known()
            if known is not None:
                drop = bh.join(
                    known.select("band", "bhash"), ["band", "bhash"], "leftsemi"
                ).select(self.id_col)
            # in-batch collisions: min-id wins its bucket, rest drop
            winner = bh.groupBy("band", "bhash").agg(
                F.min(self.id_col).alias("_keep")
            )
            in_batch = (
                bh.join(winner, ["band", "bhash"])
                .filter(F.col(self.id_col) != F.col("_keep"))
                .select(self.id_col)
            )
            drop = in_batch if drop is None else drop.unionByName(in_batch)
            drop = drop.distinct()
            survivors = batch.join(drop, [self.id_col], "left_anti")
            new_sigs = bh.join(drop, [self.id_col], "left_anti")
            # append survivors' buckets — per-batch transactional under
            # foreachBatch (a failed batch reruns; LWW-style: re-append
            # of identical (id, band, bhash) rows is harmless for the
            # leftsemi probe)
            new_sigs.write.mode("append").parquet(self.root)
            return survivors
        finally:
            bh.unpersist()

    def foreach_batch(self, sink):
        """``writeStream.foreachBatch`` adapter: dedup each micro-batch
        against the store, then hand survivors to ``sink(df, batch_id)``."""

        def _fn(batch_df: DataFrame, batch_id: int) -> None:
            sink(self.process_batch(batch_df), batch_id)

        return _fn
