"""Training-data pipeline queries (dedup / text analysis / similarity)
over the ``documents`` and ``embeddings`` tables — the 100 TB-first
extension surface.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.io import load_table
from . import q


@q(
    "ext_dedup_exact",
    """
    WITH h AS (
      SELECT doc_id, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS text_hash
      FROM documents)
    SELECT text_hash, count(*) AS n_dups, min(doc_id) AS keep_doc_id
    FROM h GROUP BY 1
    """,
)
def ext_dedup_exact(spark, sf_dir):
    """Exact dedup: md5 over normalized text, hash-groupBy, keep min id.

    At 100 TB this is the canonical shuffle-on-hash dedup; the md5 is
    computed JVM-side (no Python), and the groupBy benefits from
    map-side partial aggregation.
    """
    d = load_table(spark, sf_dir, "documents")
    h = d.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))).alias("text_hash"),
    )
    return h.groupBy("text_hash").agg(
        F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("keep_doc_id")
    )


@q(
    "ext_text_stats",
    """
    SELECT doc_id, lang, source,
           length(text) AS n_chars_actual,
           length(string_split_regex(trim(text), '\\s+')) AS n_tokens,
           length(replace(text, ' ', '')) AS n_nonspace
    FROM documents
    """,
)
def ext_text_stats(spark, sf_dir):
    """Token counting / basic text statistics, all JVM-side."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        "source",
        F.length("text").alias("n_chars_actual"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens"),
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).alias("n_nonspace"),
    )
