"""Sparse (term-based) retrieval over the documents table: BM25.

The lexical counterpart to ext/similarity.py's dense ANN family — the
other half of a training-data pipeline's search/dedup toolkit (query
benchmark sets against the corpus, route near-dup candidates, build
retrieval training pairs).

Okapi BM25 (Robertson/Lucene ``ln(1 + (N - df + 0.5)/(df + 0.5))``
idf):

    score(q, d) = Σ_{t ∈ q∩d} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

Determinism discipline (what makes the operator oracle-checkable):
every input to the formula is an exact integer aggregate (tf, dl, df,
N, Σdl — counts, never float sums), ``avgdl`` is the exact-int
division ``Σdl / N``, and each term's contribution is quantized to
decimal(18,6) BEFORE the per-document sum — decimal addition is
associative, so the score is independent of Spark's partial-agg
combine order and reproducible in any SQL engine.

100 TB shape: one shuffle builds the postings (groupBy doc,term with
map-side combine); document lengths ride the same exploded frame; the
term-frequency table shuffles by term (bounded by vocabulary, not
corpus); the query side is tiny and broadcasts into the postings
join, so the corpus never reshuffles per query; the final top-k is a
per-query window over only the matched docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from .dedup import tokens_col


def bm25_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query",
) -> DataFrame:
    """Top-k BM25 matches per query: ``(query_id, match_id, score,
    rank)`` with score rounded to 6dp and rank ties broken by doc id."""
    toks = corpus.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # dl = Σ tf per doc — same integer as counting the exploded tokens,
    # but aggregated from the (much smaller) postings table instead of
    # re-shuffling the full token stream
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    # N and avgdl as exact integer aggregates (one tiny row, broadcast)
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfreq"))
    qterms = queries.select(
        F.col(query_id_col),
        F.explode(F.array_distinct(tokens_col(F.col(query_text_col)))).alias("term"),
    )
    joined = (
        tf.join(F.broadcast(qterms), "term")
        .join(dl, id_col)
        .join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("dfreq") + F.lit(0.5))
        / (F.col("dfreq") + F.lit(0.5))
    )
    contrib = (
        idf
        * F.col("tf")
        * F.lit(k1 + 1.0)
        / (F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / avgdl))
    )
    scored = (
        joined.withColumn(
            "_c", F.round(contrib, 6).cast("decimal(18,6)")
        )
        .groupBy(query_id_col, id_col)
        .agg(F.sum("_c").cast("double").alias("score"))
    )
    w = W.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(
            query_id_col,
            F.col(id_col).alias("match_id"),
            "score",
            F.col("_rn").cast("int").alias("rank"),
        )
    )


def tfidf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query",
) -> DataFrame:
    """Top-k TF-IDF cosine matches per query: ``(query_id, match_id,
    score, rank)``.

    Weighting: ``w(d,t) = tf · ln(N/df)``; score is the cosine between
    the query's and document's sparse weight vectors. Query terms
    absent from the corpus vocabulary carry no weight (idf undefined)
    and are excluded from the query norm — the standard inner-join
    convention.

    Determinism (same discipline as :func:`bm25_topk`): tf/df/N are
    exact integer aggregates; each weight is quantized to 6dp, and both
    the dot product and the squared norms sum decimal(18,6) terms —
    associative, so partition order can't shift the result; ``ln`` and
    ``sqrt`` are IEEE-identical across engines.

    100 TB shape: identical to BM25 — one postings shuffle
    (groupBy doc,term with map-side combine), a vocabulary-bounded df
    table, document norms aggregated from the postings (not the raw
    token stream), broadcast query side; the corpus never reshuffles
    per query.
    """
    toks = corpus.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy(id_col).agg(F.count(F.lit(1)).alias("_nt"))
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfreq"))

    idf = F.log(F.col("n_docs").cast("double") / F.col("dfreq"))
    wd = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("w", F.round(F.col("tf") * idf, 6))
    )
    norm_d = wd.groupBy(id_col).agg(
        F.sqrt(
            F.sum(F.round(F.col("w") * F.col("w"), 6).cast("decimal(18,6)"))
            .cast("double")
        ).alias("_nd")
    )

    qtf = (
        queries.select(
            F.col(query_id_col),
            F.explode(tokens_col(F.col(query_text_col))).alias("term"),
        )
        .groupBy(query_id_col, "term")
        .agg(F.count(F.lit(1)).alias("qtf"))
    )
    wq = (
        qtf.join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("wq", F.round(F.col("qtf") * idf, 6))
        .select(query_id_col, "term", "wq")
    )
    norm_q = wq.groupBy(query_id_col).agg(
        F.sqrt(
            F.sum(F.round(F.col("wq") * F.col("wq"), 6).cast("decimal(18,6)"))
            .cast("double")
        ).alias("_nq")
    )

    dots = (
        wd.join(F.broadcast(wq), "term")
        .groupBy(query_id_col, id_col)
        .agg(
            F.sum(F.round(F.col("w") * F.col("wq"), 6).cast("decimal(18,6)"))
            .cast("double")
            .alias("_dot")
        )
    )
    scored = (
        dots.join(norm_d, id_col)
        .join(F.broadcast(norm_q), query_id_col)
        .withColumn("score", F.round(F.col("_dot") / (F.col("_nd") * F.col("_nq")), 6))
    )
    w = W.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(
            query_id_col,
            F.col(id_col).alias("match_id"),
            "score",
            F.col("_rn").cast("int").alias("rank"),
        )
    )
