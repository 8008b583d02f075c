"""BM25 sparse retrieval (ext/retrieval.py): ranking semantics on a
hand-built corpus where the right ordering is known."""

from __future__ import annotations

import math

from aws_greengrass_labs_database_influxdb_spark.ext.retrieval import bm25_topk


def _corpus(spark):
    rows = [
        (0, "spark shuffle join window"),
        (1, "spark spark spark shuffle"),
        (2, "window window filter scan"),
        (3, "totally unrelated words here"),
        (4, "spark window"),
        (5, "scan merge hash batch filter scan merge hash batch filter scan merge"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _queries(spark):
    return spark.createDataFrame(
        [(0, "spark window"), (1, "filter scan")], "query_id int, query string"
    )


def test_bm25_ranks_term_matches_first(spark):
    out = bm25_topk(_corpus(spark), _queries(spark), k=3)
    by_q = {}
    for r in out.collect():
        by_q.setdefault(r.query_id, []).append(r)
    q0 = sorted(by_q[0], key=lambda r: r.rank)
    # both-term docs beat single-term docs; unrelated doc never appears
    assert q0[0].match_id in (0, 4)
    assert 3 not in {r.match_id for rs in by_q.values() for r in rs}
    # scores are positive, non-increasing with rank
    for rs in by_q.values():
        ordered = sorted(rs, key=lambda r: r.rank)
        assert all(r.score > 0 for r in ordered)
        assert all(
            ordered[i].score >= ordered[i + 1].score for i in range(len(ordered) - 1)
        )


def test_bm25_score_matches_reference_formula(spark):
    """Pin one score against a literal Python computation."""
    out = {
        (r.query_id, r.match_id): r.score
        for r in bm25_topk(_corpus(spark), _queries(spark), k=6).collect()
    }
    # corpus stats by hand: N=6 docs; dl = [4,4,4,4,2,12]; sum=30; avgdl=5
    # doc 4 ("spark window"), query 0 terms {spark, window}:
    #   spark: tf=1, df=3; window: tf=1, df=3
    n, avgdl = 6, 30.0 / 6
    k1, b = 1.2, 0.75

    def contrib(tf, df, dl):
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        c = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
        return round(c, 6)

    want = round(contrib(1, 3, 2) + contrib(1, 3, 2), 6)
    assert abs(out[(0, 4)] - want) < 1e-9


def test_bm25_k_bounds_results(spark):
    out = bm25_topk(_corpus(spark), _queries(spark), k=2).collect()
    per_q = {}
    for r in out:
        per_q[r.query_id] = per_q.get(r.query_id, 0) + 1
    assert all(v <= 2 for v in per_q.values())


def test_tfidf_exact_duplicate_ranks_first(spark):
    """A query that IS a document's text must rank that document at
    cosine ≈ 1.0 ahead of partial matches."""
    from aws_greengrass_labs_database_influxdb_spark.ext.retrieval import tfidf_topk

    q = spark.createDataFrame(
        [(0, "spark shuffle join window"), (1, "filter scan")],
        "query_id int, query string",
    )
    out = tfidf_topk(_corpus(spark), q, k=3)
    by_q = {}
    for r in out.collect():
        by_q.setdefault(r.query_id, []).append(r)
    q0 = sorted(by_q[0], key=lambda r: r.rank)
    assert q0[0].match_id == 0 and abs(q0[0].score - 1.0) < 1e-5
    # cosine normalization: repeating a term (doc 1) can't beat the
    # exact duplicate; unrelated doc 3 never appears
    assert 3 not in {r.match_id for rs in by_q.values() for r in rs}
    for rs in by_q.values():
        ordered = sorted(rs, key=lambda r: r.rank)
        assert all(
            a.score >= b.score for a, b in zip(ordered, ordered[1:])
        )
        assert all(0.0 < r.score <= 1.0 + 1e-9 for r in ordered)


def test_tfidf_repartition_invariant(spark):
    """Decimal-quantized sums: the scores cannot depend on partitioning."""
    from aws_greengrass_labs_database_influxdb_spark.ext.retrieval import tfidf_topk

    c = _corpus(spark)
    got1 = {
        (r.query_id, r.match_id, r.score, r.rank)
        for r in tfidf_topk(c, _queries(spark), k=3).collect()
    }
    got2 = {
        (r.query_id, r.match_id, r.score, r.rank)
        for r in tfidf_topk(c.repartition(7), _queries(spark), k=3).collect()
    }
    assert got1 == got2
