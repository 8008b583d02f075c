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


_NGRAM_PAIRS_SQL = """
    WITH t AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
      FROM documents),
    sh0 AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, greatest(len(toks), 3) - 2),
                      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS shingle
        FROM t)),
    -- skew guard (default-on in the engine): shingles in >1000 docs drop
    keep AS (SELECT shingle FROM sh0 GROUP BY shingle HAVING count(*) <= 1000),
    sh AS (SELECT sh0.* FROM sh0 JOIN keep USING (shingle)),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    pair AS (
      SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS common
      FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
      GROUP BY 1, 2)
    SELECT a, b, common, sa.n AS sz_a, sb.n AS sz_b,
           common / (sa.n + sb.n - common) AS jaccard
    FROM pair JOIN sz sa ON pair.a = sa.doc_id JOIN sz sb ON pair.b = sb.doc_id
    WHERE common / (sa.n + sb.n - common) >= 0.5
    """


@q("ext_dedup_ngram_jaccard", _NGRAM_PAIRS_SQL)
def ext_dedup_ngram_jaccard(spark, sf_dir):
    """3-gram Jaccard near-dup pairs (exact set arithmetic — integer
    counts, so cross-engine equality is trivial)."""
    from ..ext.dedup import ngram_jaccard_pairs

    d = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, n=3, threshold=0.5)


@q(
    "ext_dedup_clusters",
    f"""
    WITH RECURSIVE pairs AS ({_NGRAM_PAIRS_SQL}),
    e AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
    r AS (
      SELECT id, id AS label FROM (SELECT DISTINCT a AS id FROM e)
      UNION
      SELECT e.a AS id, r.label FROM e JOIN r ON r.id = e.b
    )
    SELECT id AS doc_id, min(label) AS cluster_id FROM r GROUP BY id
    """,
)
def ext_dedup_clusters(spark, sf_dir):
    """Connected components over the near-dup pair graph: pairwise
    similarity → dedup groups (cluster_id = min reachable doc id) via
    iterative min-label propagation; the oracle is a recursive-CTE
    transitive closure — both deterministic, exact match."""
    from ..ext.dedup import dedup_clusters, ngram_jaccard_pairs

    d = load_table(spark, sf_dir, "documents")
    return dedup_clusters(ngram_jaccard_pairs(d, n=3, threshold=0.5))


@q(
    "ext_corpus_clean",
    """
    WITH RECURSIVE t0 AS (
      SELECT doc_id, text, length(text) AS chars,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks,
             length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS alpha
      FROM documents),
    qual AS (
      SELECT doc_id,
             (CASE WHEN chars >= 100 AND chars <= 20000 THEN 1.0 ELSE 0.0 END
              + alpha / chars
              + least(len(list_filter(toks, x -> x IN ('the','and','of','to'))) / len(toks) / 0.2, 1.0)
              + len(list_distinct(toks)) / len(toks)) / 4 AS quality
      FROM t0),
    good AS (
      SELECT t0.doc_id, t0.text, t0.toks, qual.quality
      FROM t0 JOIN qual USING (doc_id) WHERE qual.quality >= 0.62),
    keepers AS (
      SELECT min(doc_id) AS doc_id
      FROM (SELECT doc_id, md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS h
            FROM good)
      GROUP BY h),
    uniq AS (SELECT good.* FROM good JOIN keepers USING (doc_id)),
    sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, greatest(len(toks), 3) - 2),
                      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS shingle
        FROM uniq)),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    pair AS (
      SELECT s1.doc_id AS a, s2.doc_id AS b, count(*) AS common
      FROM sh s1 JOIN sh s2 USING (shingle)
      WHERE s1.doc_id < s2.doc_id
      GROUP BY 1, 2),
    pairs AS (
      SELECT a, b FROM pair
      JOIN sz sa ON pair.a = sa.doc_id JOIN sz sb ON pair.b = sb.doc_id
      WHERE common / (sa.n + sb.n - common) >= 0.5),
    e AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
    r AS (
      SELECT id, id AS label FROM (SELECT DISTINCT a AS id FROM e)
      UNION
      SELECT e.a AS id, r.label FROM e JOIN r ON r.id = e.b
    ),
    cl AS (SELECT id, min(label) AS cluster FROM r GROUP BY id),
    kept AS (
      SELECT uniq.* FROM uniq
      WHERE doc_id NOT IN (SELECT id FROM cl WHERE id <> cluster)),
    lid AS (
      SELECT doc_id, lang_code AS lang_pred,
             row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang_code DESC) rn
      FROM (
        SELECT kept.doc_id, l.lang_code, len(list_intersect(kept.toks, l.markers)) AS hits
        FROM kept CROSS JOIN (
          SELECT * FROM (VALUES
            ('de', ['der','die','das','und','nicht','ist']),
            ('en', ['the','and','of','to','is','a']),
            ('es', ['el','la','los','que','y','es']),
            ('fr', ['le','la','les','et','est','que']),
            ('zh', ['de5','shi4','le5','zai4','he2','you3'])
          ) AS l(lang_code, markers)) l))
    SELECT kept.doc_id, lid.lang_pred, kept.quality
    FROM kept JOIN lid ON kept.doc_id = lid.doc_id AND lid.rn = 1
    """,
)
def ext_corpus_clean(spark, sf_dir):
    """End-to-end corpus cleaning — the composed training-data
    pipeline: quality-score filter (>= 0.62) → exact dedup (md5
    groupBy, keep min id) → near-dup removal (3-gram Jaccard >= 0.5
    pairs → connected components, keep cluster min) → language-ID of
    the survivors. Every stage is the already-oracled operator; the
    composition itself is what a 100 TB pretraining-prep job runs.
    All stages fuse into one lazy plan except the label-propagation
    rounds, which cache per-round label frames (bounded by |docs in
    pairs| — tiny relative to the corpus)."""
    from ..ext.dedup import dedup_clusters, exact_dedup, ngram_jaccard_pairs
    from ..ext.text import language_id, quality_score

    d = load_table(spark, sf_dir, "documents")
    qs = quality_score(d).select("doc_id", "quality")
    good = d.join(qs.filter(F.col("quality") >= 0.62), "doc_id")
    uniq = good.join(
        exact_dedup(good).select(F.col("keep_doc_id").alias("doc_id")),
        "doc_id",
        "left_semi",
    )
    clusters = dedup_clusters(ngram_jaccard_pairs(uniq, n=3, threshold=0.5))
    dropped = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    kept = uniq.join(dropped, "doc_id", "left_anti")
    lid = language_id(kept).select("doc_id", "lang_pred")
    return kept.join(lid, "doc_id").select("doc_id", "lang_pred", "quality")


@q(
    "ext_train_split",
    """
    WITH b AS (
      SELECT doc_id, lang,
             CAST(concat('0x', substr(md5('v1' || CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
               % 10000 AS bucket
      FROM documents)
    SELECT doc_id, lang, bucket,
           CASE WHEN bucket < 9000 THEN 'train'
                WHEN bucket < 9500 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
)
def ext_train_split(spark, sf_dir):
    """Deterministic train/val/test assignment: md5-bucket of the doc
    id — zero-shuffle Column expression, stable under corpus growth
    (a grown corpus never reassigns existing docs), salt-versioned."""
    from ..ext.splits import train_split

    d = load_table(spark, sf_dir, "documents")
    return train_split(d, train=0.9, val=0.05).select(
        "doc_id", "lang", "bucket", "split"
    )


@q(
    "ext_contamination",
    """
    WITH t AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
      FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, greatest(len(toks), 5) - 4),
                      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4]))) AS shingle
        FROM t)),
    bsh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0)
    SELECT s.doc_id, count(*) AS n_shingles,
           CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
           round(CAST(sum(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS contamination
    FROM sh s LEFT JOIN bsh b USING (shingle)
    GROUP BY 1
    """,
)
def ext_contamination(spark, sf_dir):
    """Benchmark-contamination check: fraction of each corpus doc's
    5-gram shingles that appear in the benchmark set (here: every
    97th doc as a stand-in eval set). Benchmark shingles broadcast;
    the corpus never shuffles."""
    from ..ext.splits import contamination

    d = load_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    return contamination(d, bench, n=5)


@q(
    "ext_text_langid",
    """
    WITH t AS (
      SELECT doc_id, lang,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
      FROM documents),
    scored AS (
      SELECT doc_id, lang, l.lang_code,
             len(list_intersect(toks, l.markers)) AS hits
      FROM t CROSS JOIN (
        SELECT * FROM (VALUES
          ('de', ['der','die','das','und','nicht','ist']),
          ('en', ['the','and','of','to','is','a']),
          ('es', ['el','la','los','que','y','es']),
          ('fr', ['le','la','les','et','est','que']),
          ('zh', ['de5','shi4','le5','zai4','he2','you3'])
        ) AS l(lang_code, markers)) l),
    best AS (
      SELECT doc_id, lang, lang_code AS lang_pred, hits,
             row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang_code DESC) rn
      FROM scored)
    SELECT doc_id, lang, lang_pred, cast(hits as int) AS lang_pred_hits
    FROM best WHERE rn = 1
    """,
)
def ext_text_langid(spark, sf_dir):
    """Language-ID heuristic: marker-lexicon hit argmax per doc (ties →
    last language code — matched on both sides)."""
    from ..ext.text import language_id

    d = load_table(spark, sf_dir, "documents")
    out = language_id(d)
    return out.select("doc_id", "lang", "lang_pred", F.col("lang_pred_hits").cast("int"))


@q(
    "ext_text_quality",
    """
    WITH t AS (
      SELECT doc_id, text, length(text) AS chars,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks,
             length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) AS alpha
      FROM documents),
    c AS (
      SELECT doc_id, chars,
             CASE WHEN chars >= 100 AND chars <= 20000 THEN 1.0 ELSE 0.0 END AS length_ok,
             alpha / chars AS alpha_ratio,
             least(len(list_filter(toks, x -> x IN ('the','and','of','to'))) / len(toks) / 0.2, 1.0) AS stop_ratio,
             len(list_distinct(toks)) / len(toks) AS distinct_ratio
      FROM t)
    SELECT doc_id, cast(chars as bigint) AS n_chars_m, alpha_ratio, stop_ratio, distinct_ratio,
           (length_ok + alpha_ratio + stop_ratio + distinct_ratio) / 4 AS quality
    FROM c
    """,
)
def ext_text_quality(spark, sf_dir):
    """Quality scoring: length/alpha/stopword/repetition components,
    rational arithmetic (exact cross-engine)."""
    from ..ext.text import quality_score

    d = load_table(spark, sf_dir, "documents")
    out = quality_score(d)
    return out.select(
        "doc_id", "n_chars_m", "alpha_ratio", "stop_ratio", "distinct_ratio", "quality"
    )


@q(
    "ext_token_subwords",
    """
    WITH t AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks,
             length(text) AS chars
      FROM documents)
    SELECT doc_id,
           cast(len(toks) as bigint) AS n_tokens,
           cast(list_sum(list_transform(toks, t -> cast(ceil(length(t) / 4.0) as bigint))) as bigint) AS n_subwords,
           chars / len(toks) AS avg_token_len
    FROM t
    """,
)
def ext_token_subwords(spark, sf_dir):
    """Token counting + BPE-ish subword estimate (⌈len/4⌉ per token)."""
    from ..ext.text import token_stats

    d = load_table(spark, sf_dir, "documents")
    return token_stats(d).select("doc_id", "n_tokens", "n_subwords", "avg_token_len")


@q(
    "ext_similarity_topk",
    """
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
    prod AS (
      SELECT q.vec_id AS query_id, c.vec_id AS match_id,
             unnest(q.embedding)::double AS x, unnest(c.embedding)::double AS y
      FROM q CROSS JOIN embeddings c WHERE c.vec_id <> q.vec_id),
    dots AS (
      SELECT query_id, match_id, sum(x * y) AS dot,
             sum(x * x) AS qq, sum(y * y) AS cc
      FROM prod GROUP BY 1, 2),
    scored AS (
      SELECT query_id, match_id,
             round(dot / (sqrt(qq) * sqrt(cc)), 6) AS cosine
      FROM dots),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, match_id ASC) AS rank
      FROM scored)
    SELECT query_id, match_id, cosine, cast(rank as int) AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def ext_similarity_topk(spark, sf_dir):
    """Brute-force cosine top-5 for 5 query vectors — the exact-ANN
    baseline (zip_with/aggregate dot products, JVM-side)."""
    from ..ext.similarity import brute_force_topk

    e = load_table(spark, sf_dir, "embeddings")
    out = brute_force_topk(e, e.filter(F.col("vec_id") < 5), k=5)
    return out.withColumn("rank", F.col("rank").cast("int"))


@q(
    "ext_embedding_near_dup",
    """
    WITH prod AS (
      SELECT a.vec_id AS a, b.vec_id AS b,
             unnest(a.embedding)::double AS x, unnest(b.embedding)::double AS y
      FROM embeddings a CROSS JOIN embeddings b WHERE a.vec_id < b.vec_id),
    dots AS (
      SELECT a, b, sum(x * y) AS dot, sum(x * x) AS aa, sum(y * y) AS bb
      FROM prod GROUP BY 1, 2)
    SELECT a, b, round(dot / (sqrt(aa) * sqrt(bb)), 6) AS cosine
    FROM dots WHERE round(dot / (sqrt(aa) * sqrt(bb)), 6) >= 0.4
    """,
)
def ext_embedding_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup pairs (exact all-pairs at test scale;
    the LSH-bucketed variant is the production path — see
    ext_embedding_near_dup_lsh)."""
    from ..ext.similarity import embedding_near_dup_pairs

    e = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(e, threshold=0.4, exact=True)


# Hyperplane-LSH oracle: the md5 hash mode derives plane p's weight
# for dim d from md5("d:p:seed") (value in [-3,3]), and the projection
# is a left-to-right double fold — list_reduce replays the identical
# association order, so DuckDB reproduces every bucket id, the band
# join, and the final cosine filter exactly. Generated SQL: 4 tables ×
# 8 plane-projections of 64 md5-weighted terms.
def _lsh_bucket_expr(t: int, planes: int = 8) -> str:
    terms = []
    for p in range(planes):
        w = (
            f"((('0x' || substr(md5((i-1)::VARCHAR || ':{p}:{t}'), 1, 8))::BIGINT % 7) - 3)"
        )
        proj = (
            f"list_reduce(list_transform(range(1, 65), "
            f"i -> embedding[i]::DOUBLE * {w}), (acc, x) -> acc + x)"
        )
        terms.append(f"(CASE WHEN {proj} >= 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(terms)


_LSH_SIG_SELECTS = "\n      UNION ALL\n".join(
    f"      SELECT vec_id, {t} AS tbl, {_lsh_bucket_expr(t)} AS bucket FROM embeddings"
    for t in range(4)
)
_NEAR_DUP_LSH_SQL = f"""
    WITH sig AS (
{_LSH_SIG_SELECTS}
    ),
    cand AS (
      SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
      FROM sig x JOIN sig y
        ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.vec_id < y.vec_id
    ),
    prod AS (
      SELECT c.a, c.b,
             unnest(ea.embedding)::DOUBLE AS x, unnest(eb.embedding)::DOUBLE AS y
      FROM cand c
      JOIN embeddings ea ON ea.vec_id = c.a
      JOIN embeddings eb ON eb.vec_id = c.b
    ),
    dots AS (
      SELECT a, b, sum(x * y) AS dot, sum(x * x) AS aa, sum(y * y) AS bb
      FROM prod GROUP BY 1, 2
    )
    SELECT a, b, round(dot / (sqrt(aa) * sqrt(bb)), 6) AS cosine
    FROM dots WHERE round(dot / (sqrt(aa) * sqrt(bb)), 6) >= 0.4
"""


@q("ext_embedding_near_dup_lsh", _NEAR_DUP_LSH_SQL)
def ext_embedding_near_dup_lsh(spark, sf_dir):
    """LSH-bucketed near-dup (the 100 TB path).

    Uses the portable md5 hyperplane-weight mode so the DuckDB oracle
    reproduces bucket assignments and the final cosine filter exactly
    (the xxhash64 default stays the fast path; recall vs the exact
    variant is additionally unit-tested)."""
    from ..ext.similarity import embedding_near_dup_pairs

    e = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(e, threshold=0.4, exact=False, hash_mode="md5")


# MinHash oracle: the md5 hash mode is engine-portable (one md5 base
# per shingle + affine transforms mod 2^31-1, constants shared with
# the Spark plan via minhash_affine_consts), so DuckDB reproduces
# signatures, banding, and estimated Jaccard bit-for-bit. Generated
# SQL: 32 min() slots, 8 band selects (num_hashes=32, bands=8).
from ..ext.dedup import MINHASH_P as _MH_P, minhash_affine_consts as _mh_consts

_MH_MINS = ",\n             ".join(
    f"min(({a} * base + {b}) % {_MH_P}) AS mh_{i}"
    for i, (a, b) in enumerate(_mh_consts(32))
)
_MH_SIG = "[" + ", ".join(f"mh_{i}" for i in range(32)) + "]"
_MH_BANDED = "\n      UNION ALL\n".join(
    f"      SELECT doc_id, {b} AS band, "
    f"[{', '.join(f'mh_{b * 4 + r}' for r in range(4))}] AS slots FROM sig"
    for b in range(8)
)
_MINHASH_LSH_SQL = rf"""
    WITH t AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_distinct(list_transform(range(1, greatest(len(toks), 3) - 1),
               i -> array_to_string(toks[i:i+2], ' ')))) AS shingle
      FROM t
    ),
    shb AS (
      SELECT doc_id,
             ('0x' || substr(md5(shingle), 1, 15))::BIGINT % {_MH_P} AS base
      FROM sh
    ),
    sig AS (
      SELECT doc_id,
             {_MH_MINS}
      FROM shb GROUP BY 1
    ),
    banded AS (
{_MH_BANDED}
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      FROM banded x JOIN banded y
        ON x.band = y.band AND x.slots = y.slots AND x.doc_id < y.doc_id
    ),
    sigs AS (SELECT doc_id, {_MH_SIG} AS sig FROM sig)
    SELECT c.a, c.b,
           list_sum(list_transform(range(1, 33),
             i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) / 32.0
             AS est_jaccard
    FROM cand c
    JOIN sigs sa ON sa.doc_id = c.a
    JOIN sigs sb ON sb.doc_id = c.b
"""


@q("ext_dedup_minhash_lsh", _MINHASH_LSH_SQL)
def ext_dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH candidate pairs with signature-estimated Jaccard.

    Uses the portable md5 hash mode so the DuckDB oracle reproduces the
    exact signatures and band buckets (the xxhash64 default stays the
    fast path for production use; both are single-shuffle JVM plans)."""
    from ..ext.dedup import minhash_lsh_pairs

    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, n=3, num_hashes=32, bands=8, hash_mode="md5")


# SimHash oracle: the md5 hash mode draws each token's 64 hash bits
# from two 32-bit halves of the md5 hex digest — reproducible in any
# SQL engine, so DuckDB rebuilds the per-bit ±1 votes, the sign
# signature, the 4-band pigeonhole join (max_hamming=3 → width 16),
# and the Hamming filter bit-for-bit. Generated SQL: 64 vote sums,
# 64-element sign list, 4 band selects.
_SH_SUMS = ",\n             ".join(
    f"sum(CASE WHEN (({'lo' if i < 32 else 'hi'} >> {i % 32}) & 1) = 1 "
    f"THEN 1 ELSE -1 END) AS s_{i}"
    for i in range(64)
)
_SH_BITS = "[" + ", ".join(
    f"CASE WHEN s_{i} > 0 THEN 1 ELSE 0 END" for i in range(64)
) + "]"
_SH_BANDED = "\n      UNION ALL\n".join(
    f"      SELECT doc_id, {b} AS band, "
    f"[{', '.join(f'bits[{b * 16 + r + 1}]' for r in range(16))}] AS slice "
    f"FROM bitl"
    for b in range(4)
)
_SIMHASH_SQL = rf"""
    WITH t AS (
      SELECT doc_id,
             unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
      FROM documents
    ),
    th AS (
      SELECT doc_id,
             ('0x' || substr(md5(tok), 1, 8))::BIGINT AS lo,
             ('0x' || substr(md5(tok), 9, 8))::BIGINT AS hi
      FROM t
    ),
    s AS (
      SELECT doc_id,
             {_SH_SUMS}
      FROM th GROUP BY 1
    ),
    bitl AS (
      SELECT doc_id, {_SH_BITS} AS bits FROM s
    ),
    banded AS (
{_SH_BANDED}
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      FROM banded x JOIN banded y
        ON x.band = y.band AND x.slice = y.slice AND x.doc_id < y.doc_id
    )
    SELECT c.a, c.b,
           CAST(list_sum(list_transform(range(1, 65),
             i -> CASE WHEN ba.bits[i] <> bb.bits[i] THEN 1 ELSE 0 END))
             AS INTEGER) AS hamming
    FROM cand c
    JOIN bitl ba ON ba.doc_id = c.a
    JOIN bitl bb ON bb.doc_id = c.b
    WHERE list_sum(list_transform(range(1, 65),
            i -> CASE WHEN ba.bits[i] <> bb.bits[i] THEN 1 ELSE 0 END)) <= 3
"""


@q("ext_dedup_simhash", _SIMHASH_SQL)
def ext_dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs at Hamming distance ≤ 3.

    Uses the portable md5 token-hash mode so the DuckDB oracle
    reproduces signatures, band buckets, and Hamming distances exactly
    (the xxhash64 default stays the fast path; same one-shuffle plan)."""
    from ..ext.dedup import simhash_near_pairs

    d = load_table(spark, sf_dir, "documents")
    return simhash_near_pairs(d, max_hamming=3, hash_mode="md5")


@q(
    "ext_doc_fingerprint",
    r"""
    WITH t AS (
      SELECT doc_id,
             md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint_md5,
             string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id, fingerprint_md5,
             list_transform(range(1, greatest(len(toks), 5) - 3),
               i -> ('0x' || substr(md5(array_to_string(toks[i:i+4], ' ')), 1, 15))::BIGINT
             ) AS grams
      FROM t
    )
    SELECT doc_id, fingerprint_md5, to_json(list_sort(grams)[1:4]) AS fp_mins FROM g
    """,
)
def ext_doc_fingerprint(spark, sf_dir):
    """Winnowing-style fingerprints: md5 of normalized text + the 4
    minima of the word-5-gram hash stream. Gram hash = first 60 bits of
    md5 (engine-portable) so the DuckDB oracle reproduces it exactly."""
    from ..ext.text import document_fingerprint

    d = load_table(spark, sf_dir, "documents")
    out = document_fingerprint(d)
    return out.select("doc_id", "fingerprint_md5", F.to_json("fingerprint_mins").alias("fp_mins"))


@q(
    "ext_similarity_ivf",
    """
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
    prod AS (
      SELECT q.vec_id AS query_id, c.vec_id AS match_id,
             unnest(q.embedding)::double AS x, unnest(c.embedding)::double AS y
      FROM q CROSS JOIN embeddings c WHERE c.vec_id <> q.vec_id),
    dots AS (
      SELECT query_id, match_id, sum(x * y) AS dot,
             sum(x * x) AS qq, sum(y * y) AS cc
      FROM prod GROUP BY 1, 2),
    scored AS (
      SELECT query_id, match_id,
             round(dot / (sqrt(qq) * sqrt(cc)), 6) AS cosine
      FROM dots),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, match_id ASC) AS rank
      FROM scored)
    SELECT query_id, match_id, cosine, cast(rank as int) AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def ext_similarity_ivf(spark, sf_dir):
    """IVF ANN (coarse-quantizer routing) at full probe: every cell is
    probed, so the result must equal brute force exactly — which puts
    the whole k-means build → cell assignment → probe → score pipeline
    under the exact oracle gate. Partial-probe recall (the production
    configuration) is asserted in unit tests."""
    from ..ext.similarity import ivf_build, ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    indexed, centroids = ivf_build(e, n_centroids=8, max_iter=4)
    out = ivf_topk(indexed, centroids, e.filter(F.col("vec_id") < 5), k=5, nprobe=8)
    return out.withColumn("rank", F.col("rank").cast("int"))


# PQ oracle: the codebook is data-independent (seeded, 6dp literals —
# identical doubles in every engine) and shared verbatim between the
# Spark plan and the generated SQL, so DuckDB reproduces the encode
# argmins (same first-minimum tie rule), each query's m×k ADC lookup
# table, and the left-associated ADC sums bit-for-bit.
def _pq_sql() -> str:
    from ..ext.similarity import pq_codebook_random

    cb = pq_codebook_random(m=8, k=16, sub_dim=8)
    cb_lit = (
        "["
        + ", ".join(
            "[" + ", ".join("[" + ", ".join(f"{v:.6f}" for v in cent) + "]" for cent in sub)
            + "]"
            for sub in cb
        )
        + "]"
    )
    term = lambda j: (
        f"(e.embedding[t.s*8+{j + 1}]::DOUBLE - cb[t.s+1][c][{j + 1}]) * "
        f"(e.embedding[t.s*8+{j + 1}]::DOUBLE - cb[t.s+1][c][{j + 1}])"
    )
    dist = " + ".join(term(j) for j in range(8))
    adc = " + ".join(f"l.lut[{s + 1}][c.codes[{s + 1}]+1]" for s in range(8))
    return f"""
    WITH cbt AS (SELECT {cb_lit} AS cb),
    dl AS (
      SELECT e.vec_id, t.s,
             list_transform(range(1, 17), c -> {dist}) AS dists
      FROM embeddings e CROSS JOIN cbt CROSS JOIN range(0, 8) t(s)
    ),
    codes AS (
      SELECT vec_id, s, CAST(list_position(dists, list_min(dists)) - 1 AS INT) AS code
      FROM dl
    ),
    codesl AS (SELECT vec_id, list(code ORDER BY s) AS codes FROM codes GROUP BY vec_id),
    lut AS (
      SELECT vec_id AS query_id, list(dists ORDER BY s) AS lut
      FROM dl WHERE vec_id < 5 GROUP BY vec_id
    ),
    pairs AS (
      SELECT l.query_id, c.vec_id AS match_id, {adc} AS adc
      FROM lut l CROSS JOIN codesl c WHERE c.vec_id <> l.query_id
    ),
    ranked AS (
      SELECT query_id, match_id, round(adc, 6) AS adc,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY round(adc, 6) ASC, match_id ASC) AS rank
      FROM pairs
    )
    SELECT query_id, match_id, adc, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 5
"""


@q("ext_similarity_ivfpq", _pq_sql())
def ext_similarity_ivfpq(spark, sf_dir):
    """IVF-PQ at full probe: every cell is probed, so the cell-routed
    ADC scan must equal plain PQ-ADC exactly — which puts the whole
    composition (k-means cell assignment → probe routing → code scan →
    ADC ranking) under the same exact oracle as ext_similarity_pq
    (mirroring ext_similarity_ivf's full-probe ≡ brute-force gate).
    Partial-probe behavior is unit-tested."""
    from ..ext.similarity import ivf_build, ivf_pq_topk, pq_codebook_random

    e = load_table(spark, sf_dir, "embeddings")
    indexed, centroids = ivf_build(e, n_centroids=8, max_iter=4)
    cb = pq_codebook_random(m=8, k=16, sub_dim=8)
    return ivf_pq_topk(
        indexed, centroids, e.filter(F.col("vec_id") < 5), cb, k=5, nprobe=8
    )


@q("ext_similarity_pq", _pq_sql())
def ext_similarity_pq(spark, sf_dir):
    """Product-quantization ANN: the corpus is scanned as 8-byte PQ
    codes (~32× smaller than float32 embeddings — the 100 TB
    compression path) and ranked by asymmetric-distance lookups.

    Uses the portable seeded codebook so the DuckDB oracle reproduces
    encode, lookup tables, and ADC sums exactly; the trained-codebook
    production path (``pq_train``) shares the same encode/ADC
    machinery and is recall-tested against brute force in unit
    tests."""
    from ..ext.similarity import pq_adc_topk, pq_codebook_random

    e = load_table(spark, sf_dir, "embeddings")
    cb = pq_codebook_random(m=8, k=16, sub_dim=8)
    return pq_adc_topk(e, e.filter(F.col("vec_id") < 5), cb, k=5)


@q(
    "ext_repetition",
    """
    WITH t AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks,
             string_split(text, chr(10)) AS lines
      FROM documents),
    bg AS (
      SELECT doc_id, list_transform(generate_series(1, greatest(len(toks), 2) - 1),
             i -> toks[i] || ' ' || toks[i+1]) AS bgs
      FROM t),
    tok_top AS (
      SELECT doc_id, max(c) AS top_tok FROM (
        SELECT doc_id, count(*) AS c
        FROM (SELECT doc_id, unnest(toks) AS tk FROM t) GROUP BY doc_id, tk)
      GROUP BY doc_id),
    bg_top AS (
      SELECT doc_id, max(c) AS top_bg, sum(c) AS n_bg,
             count(*) AS n_bg_distinct FROM (
        SELECT doc_id, count(*) AS c
        FROM (SELECT doc_id, unnest(bgs) AS g FROM bg) GROUP BY doc_id, g)
      GROUP BY doc_id)
    SELECT t.doc_id,
           len(t.toks)::BIGINT AS n_tokens,
           tok_top.top_tok / len(t.toks) AS top_token_frac,
           bg_top.top_bg / bg_top.n_bg AS top_bigram_frac,
           (bg_top.n_bg - bg_top.n_bg_distinct) / bg_top.n_bg AS dup_bigram_frac,
           (len(t.lines) - len(list_distinct(t.lines))) / len(t.lines) AS dup_line_frac
    FROM t JOIN tok_top USING (doc_id) JOIN bg_top USING (doc_id)
    """,
)
def ext_repetition(spark, sf_dir):
    """Gopher-style repetition signals as a map-only pass: the
    most-frequent-element counts come from a sorted-run fold inside the
    row (array_sort + aggregate), so no shuffle ever happens — the 100
    TB shape is scan → project. The oracle recomputes the same maxima
    relationally (unnest + group-by + max)."""
    from ..ext.text import repetition_signals

    d = load_table(spark, sf_dir, "documents")
    return repetition_signals(d).select(
        "doc_id", "n_tokens", "top_token_frac", "top_bigram_frac",
        "dup_bigram_frac", "dup_line_frac",
    )


@q(
    "ext_unigram_logprob",
    """
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')) AS token
      FROM documents),
    freq AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
    tot AS (SELECT sum(cnt) AS total FROM freq)
    SELECT doc_id, count(*) AS n_tokens,
           round(avg(ln(cnt / total)), 6) AS logprob_mean
    FROM tok JOIN freq USING (token) CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def ext_unigram_logprob(spark, sf_dir):
    """CCNet-style unigram LM quality score: corpus-derived token
    frequencies → per-document mean log-probability. The vocab table is
    broadcast (natural-language vocab ≪ corpus); the corpus side
    shuffles once on doc_id. Mean rounded on both sides (sum-fold
    order)."""
    from ..ext.text import unigram_logprob

    d = load_table(spark, sf_dir, "documents")
    return unigram_logprob(d).select(
        "doc_id", "n_tokens", F.round("logprob_mean", 6).alias("logprob_mean")
    )


@q(
    "ext_pii_redact",
    """
    WITH synth AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0
                  THEN 'visit http://' || source || '.example.com/' || doc_id || ' ' ELSE '' END
             || CASE WHEN doc_id % 3 != 0
                  THEN 'mail ' || lang || '.user@site-' || (doc_id % 7) || '.org ' ELSE '' END
             || 'ip 10.0.' || (doc_id % 256) || '.1 ' || text AS s
      FROM documents),
    s1 AS (SELECT doc_id, len(regexp_extract_all(s, 'https?://[^\\s]+')) AS n_url,
                  regexp_replace(s, 'https?://[^\\s]+', '<URL>', 'g') AS s FROM synth),
    s2 AS (SELECT doc_id, n_url,
                  len(regexp_extract_all(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_email,
                  regexp_replace(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS s FROM s1),
    s3 AS (SELECT doc_id, n_url, n_email,
                  len(regexp_extract_all(s, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS n_ip,
                  regexp_replace(s, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g') AS s FROM s2)
    SELECT doc_id, n_url, n_email, n_ip, md5(s) AS redacted_md5 FROM s3
    """,
)
def ext_pii_redact(spark, sf_dir):
    """PII/URL scrubbing over deterministic synthesized PII (the table
    itself carries none): URL → EMAIL → IP redaction order, per-class
    counts, and an md5 of the redacted text so the oracle checks the
    exact rewrite, not just counts. Patterns are lookaround-free
    (RE2-safe) so both regex engines agree."""
    from ..ext.text import redact_pii

    d = load_table(spark, sf_dir, "documents")
    synth = d.select(
        "doc_id",
        F.concat(
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(F.lit("visit http://"), F.col("source"),
                         F.lit(".example.com/"), F.col("doc_id").cast("string"),
                         F.lit(" ")),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 3 != 0,
                F.concat(F.lit("mail "), F.col("lang"), F.lit(".user@site-"),
                         (F.col("doc_id") % 7).cast("string"), F.lit(".org ")),
            ).otherwise(F.lit("")),
            F.lit("ip 10.0."), (F.col("doc_id") % 256).cast("string"),
            F.lit(".1 "), F.col("text"),
        ).alias("text"),
    )
    out = redact_pii(synth)
    return out.select(
        "doc_id",
        F.col("n_url").cast("long").alias("n_url"),
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_ip").cast("long").alias("n_ip"),
        F.md5("text_redacted").alias("redacted_md5"),
    )


@q(
    "ext_span_dedup",
    """
    WITH t AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ') AS toks
      FROM documents),
    c0 AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(0, cast(ceil(len(toks) / 8.0) AS INT) - 1),
               i -> {'idx': i,
                     'span': array_to_string(list_slice(toks, i*8 + 1, i*8 + 8), ' ')})) AS s
      FROM t),
    c AS (SELECT doc_id, s.idx AS span_idx, s.span AS span FROM c0),
    r AS (SELECT *, row_number() OVER (PARTITION BY span ORDER BY doc_id, span_idx) AS rn
          FROM c)
    SELECT doc_id, count(*) AS n_spans,
           count(*) FILTER (WHERE rn = 1) AS n_kept,
           md5(coalesce(string_agg(CASE WHEN rn = 1 THEN span END, ' ' ORDER BY span_idx), '')) AS clean_md5
    FROM r GROUP BY doc_id
    """,
)
def ext_span_dedup(spark, sf_dir):
    """C4-style span-level corpus dedup: non-overlapping 8-token spans,
    first corpus occurrence (doc_id, span_idx) wins, documents
    reassembled from surviving spans. One shuffle keyed by span text +
    one groupBy(doc) — no joins back to the corpus, no all-pairs. The
    oracle replays the exact window/reassembly."""
    from ..ext.dedup import span_dedup

    d = load_table(spark, sf_dir, "documents")
    out = span_dedup(d, span_tokens=8)
    return out.select(
        "doc_id", "n_spans", "n_kept", F.md5("text_clean").alias("clean_md5")
    )


@q(
    "ext_semantic_dedup",
    """
    WITH RECURSIVE prod AS (
      SELECT a.vec_id AS a, b.vec_id AS b,
             unnest(a.embedding)::double AS x, unnest(b.embedding)::double AS y
      FROM embeddings a CROSS JOIN embeddings b WHERE a.vec_id < b.vec_id),
    dots AS (
      SELECT a, b, sum(x * y) AS dot, sum(x * x) AS aa, sum(y * y) AS bb
      FROM prod GROUP BY 1, 2),
    p AS (SELECT a, b FROM dots
          WHERE round(dot / (sqrt(aa) * sqrt(bb)), 6) >= 0.4),
    e2 AS (SELECT a, b FROM p UNION SELECT b AS a, a AS b FROM p),
    r AS (
      SELECT id, id AS label FROM (SELECT DISTINCT a AS id FROM e2)
      UNION
      SELECT e2.a AS id, r.label FROM e2 JOIN r ON r.id = e2.b),
    lab AS (SELECT id, min(label) AS cluster_id FROM r GROUP BY id)
    SELECT v.vec_id,
           coalesce(lab.cluster_id, v.vec_id) AS cluster_id,
           cast(coalesce(lab.cluster_id, v.vec_id) = v.vec_id AS int) AS is_representative
    FROM embeddings v LEFT JOIN lab ON lab.id = v.vec_id
    """,
)
def ext_semantic_dedup(spark, sf_dir):
    """Semantic (embedding-space) dedup end-to-end: exact cosine
    near-dup pairs → connected components → minimum-id representative
    per cluster, singletons kept as their own representative. The
    production path swaps the exact pair scan for the LSH-bucketed one
    (same downstream); this exact composition runs under the full
    recursive-CTE oracle."""
    from ..ext.dedup import dedup_clusters
    from ..ext.similarity import embedding_near_dup_pairs

    e = load_table(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_pairs(e, threshold=0.4, exact=True)
    labels = dedup_clusters(pairs).withColumnRenamed("doc_id", "vec_id")
    return (
        e.select("vec_id")
        .join(labels, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("cluster_id", "vec_id").alias("cluster_id"),
            (F.coalesce("cluster_id", "vec_id") == F.col("vec_id"))
            .cast("int")
            .alias("is_representative"),
        )
    )


@q(
    "ext_multimodal_features",
    """
    SELECT doc_id AS media_id,
           CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
           octet_length(encode(text)) AS n_bytes,
           CAST(CAST(CAST('0x' || substr(sha256(text), 1, 2) AS BIGINT) / 255.0 AS REAL) AS DOUBLE) AS f0,
           CAST(CAST(CAST('0x' || substr(sha256(text), 3, 2) AS BIGINT) / 255.0 AS REAL) AS DOUBLE) AS f1,
           CAST(CAST(CAST('0x' || substr(sha256(text), 5, 2) AS BIGINT) / 255.0 AS REAL) AS DOUBLE) AS f2,
           CAST(CAST(CAST('0x' || substr(sha256(text), 7, 2) AS BIGINT) / 255.0 AS REAL) AS DOUBLE) AS f3,
           CAST(CAST(CAST('0x' || substr(sha256(text), 9, 2) AS BIGINT) / 255.0 AS REAL) AS DOUBLE) AS f4,
           CAST(CAST(CAST('0x' || substr(sha256(text), 11, 2) AS BIGINT) / 255.0 AS REAL) AS DOUBLE) AS f5,
           CAST(CAST(CAST('0x' || substr(sha256(text), 13, 2) AS BIGINT) / 255.0 AS REAL) AS DOUBLE) AS f6,
           CAST(CAST(CAST('0x' || substr(sha256(text), 15, 2) AS BIGINT) / 255.0 AS REAL) AS DOUBLE) AS f7
    FROM documents
    """,
)
def ext_multimodal_features(spark, sf_dir):
    """Multimodal decode/feature-extract plumbing, oracle-gated.

    Documents' UTF-8 bytes stand in for opaque media blobs (the
    container has no codec libs — the deterministic ``fake_decode``
    is sha256-derived, so DuckDB can reproduce it exactly). The
    pipeline exercised is the REAL one: binary column → Arrow-batched
    ``mapInPandas`` decode (``ext/multimodal.py:extract_features``)
    → flat float32 feature columns. Mirrors the reference's role as
    the data plane for arbitrary sensor payloads
    (reference: README.md "Sending data to InfluxDB").
    """
    from ..ext.multimodal import extract_features, fake_decode

    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("image"))
        .otherwise(F.lit("audio"))
        .alias("kind"),
        F.col("text").cast("binary").alias("content"),
    )
    feats = extract_features(media, decode_fn=fake_decode)
    sel = [F.col("media_id"), F.col("kind"), F.col("n_bytes")]
    sel += [
        F.element_at("feature", i + 1).cast("double").alias(f"f{i}") for i in range(8)
    ]
    return feats.select(*sel)


@q(
    "ext_frame_sample",
    """
    SELECT doc_id AS media_id, unnest(generate_series(0, greatest(n_chars * 7 - 1, 0), 1000)) AS frame_ms
    FROM documents WHERE doc_id % 5 = 0
    """,
)
def ext_frame_sample(spark, sf_dir):
    """Video frame-sampling plan: one row per sampled timestamp.

    The frame grid (``ext/multimodal.py:sample_frames``) derives
    JVM-side from ``meta.duration_ms`` via ``sequence`` + ``explode``
    — no Python, no shuffle, output rows ∝ total video duration (the
    actual frame decode is the documented codec stub). Durations are
    synthesized deterministically from ``n_chars`` so the grid is
    oracle-checkable.
    """
    from ..ext.multimodal import sample_frames

    d = load_table(spark, sf_dir, "documents")
    media = d.filter(F.col("doc_id") % 5 == 0).select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.lit(None).cast("binary").alias("content"),
        F.struct(
            F.lit("video/x-fake").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (F.col("n_chars") * 7).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )
    return sample_frames(media, every_ms=1000).select("media_id", "frame_ms")


@q(
    "ext_doc_chunks",
    """
    WITH t AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS toks
      FROM documents),
    c AS (
      SELECT doc_id, toks,
             unnest(generate_series(0, greatest(len(toks) - 1, 0), 96)) AS start
      FROM t)
    SELECT doc_id,
           CAST(start / 96 AS BIGINT) AS chunk_id,
           array_to_string(toks[start + 1 : start + 128], ' ') AS chunk_text,
           CAST(least(128, len(toks) - start) AS BIGINT) AS n_tokens
    FROM c
    """,
)
def ext_doc_chunks(spark, sf_dir):
    """Overlapping token-window chunking (128-token chunks, stride 96)
    — the long-context training prep step. Pure Column pipeline
    (split → sequence → posexplode → slice), zero shuffle: at 100 TB
    this is a map stage whose output is Σ ceil(len/stride) rows."""
    from ..ext.chunking import chunk_documents

    d = load_table(spark, sf_dir, "documents")
    return chunk_documents(d, size=128, stride=96)


@q(
    "ext_pack_sequences",
    """
    WITH t AS (
      SELECT source, doc_id,
             len(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ')) AS n_tokens
      FROM documents),
    c AS (
      SELECT source, doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
      FROM t)
    SELECT source, doc_id, n_tokens,
           CAST(floor(cum_prev / 2048) AS BIGINT) AS pack_id,
           CAST(cum_prev % 2048 AS BIGINT) AS pack_offset
    FROM c
    """,
)
def ext_pack_sequences(spark, sf_dir):
    """Deterministic sequence packing: contiguous fill of 2048-token
    training sequences within each source shard (running token count →
    pack_id/pack_offset). Per-shard windows keep the cumulative sum
    parallel — no global ordering, reproducible run-to-run (the
    property resumable dataset builds need)."""
    from ..ext.chunking import pack_sequences

    d = load_table(spark, sf_dir, "documents")
    return pack_sequences(d, budget=2048, by=("source",))


@q(
    "ext_weighted_mix",
    """
    WITH b AS (
      SELECT doc_id, source, lang,
             CAST(concat('0x', substr(md5('mix1' || CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
               % 10000 AS bucket
      FROM documents)
    SELECT doc_id, source, lang
    FROM b
    WHERE bucket < (CASE source
                    WHEN 'src0' THEN 8000
                    WHEN 'src1' THEN 5000
                    WHEN 'src2' THEN 2500
                    ELSE 1000 END)
    """,
)
def ext_weighted_mix(spark, sf_dir):
    """Deterministic corpus mixing: per-source sampling fractions via
    the md5-bucket recipe (src0 80%, src1 50%, src2 25%, rest 10%) —
    a pure Column filter: no shuffle, no RNG state, exact over the
    bucket space, and stable under corpus growth/re-runs."""
    from ..ext.splits import weighted_mix

    d = load_table(spark, sf_dir, "documents")
    return weighted_mix(
        d, {"src0": 0.8, "src1": 0.5, "src2": 0.25}, default=0.1
    ).select("doc_id", "source", "lang")


# BM25 oracle: every formula input is an exact integer aggregate and
# each term contribution is quantized to decimal(18,6) before the
# per-document sum (associative → partition-order-independent), so the
# scores reproduce exactly. All SQL numeric literals are ::DOUBLE to
# stop DuckDB's decimal-literal promotion from switching the
# arithmetic out of IEEE doubles.
_BM25_QUERIES = [
    (0, "spark window join"),
    (1, "fast hash merge scan"),
    (2, "customer data filter stream"),
]
_BM25_SQL = rf"""
    WITH q(query_id, query) AS (VALUES
      {", ".join(f"({i}, '{t}')" for i, t in _BM25_QUERIES)}),
    tok AS (
      SELECT doc_id,
             unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
    stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
    dfreq AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY 1),
    qt AS (
      SELECT query_id,
             unnest(list_distinct(string_split(lower(trim(regexp_replace(query, '\s+', ' ', 'g'))), ' '))) AS term
      FROM q
    ),
    j AS (
      SELECT qt.query_id, tf.doc_id,
             round(
               ln(1.0::DOUBLE + (s.n_docs - d.dfreq + 0.5::DOUBLE) / (d.dfreq + 0.5::DOUBLE))
               * tf.tf * 2.2::DOUBLE
               / (tf.tf + 1.2::DOUBLE * (0.25::DOUBLE + 0.75::DOUBLE * dl.dl / (s.sum_dl::DOUBLE / s.n_docs))),
               6)::DECIMAL(18,6) AS c
      FROM tf
      JOIN qt USING (term)
      JOIN dl USING (doc_id)
      JOIN dfreq d USING (term)
      CROSS JOIN stats s
    ),
    sc AS (SELECT query_id, doc_id, CAST(sum(c) AS DOUBLE) AS score FROM j GROUP BY 1, 2),
    r AS (
      SELECT query_id, doc_id AS match_id, score,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
      FROM sc
    )
    SELECT query_id, match_id, score, CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 5
"""


@q("ext_retrieval_bm25", _BM25_SQL)
def ext_retrieval_bm25(spark, sf_dir):
    """Okapi BM25 top-5 for three fixed literal queries — sparse
    lexical retrieval over the documents table (inverted-index shape:
    one postings shuffle, vocabulary-bounded df table, broadcast query
    side). Integer-exact formula inputs + decimal-quantized term
    contributions make the score oracle-exact."""
    from ..ext.retrieval import bm25_topk

    d = load_table(spark, sf_dir, "documents")
    qdf = spark.createDataFrame(_BM25_QUERIES, "query_id int, query string")
    return bm25_topk(d, qdf, k=5)


# SQ8 oracle: quantization ranges are per-dimension order statistics
# (min/max — exact at any parallelism, unlike float sums), and encode/
# decode/distance are identical IEEE expression trees with strict
# left-to-right distance folds, so DuckDB reproduces codes and
# rankings exactly.
_SQ8_SQL = """
    WITH dim AS (
      SELECT u.d,
             min(e.embedding[u.d]::DOUBLE) AS mn,
             max(e.embedding[u.d]::DOUBLE) AS mx
      FROM embeddings e CROSS JOIN range(1, 65) u(d) GROUP BY u.d
    ),
    params AS (
      SELECT list(mn ORDER BY d) AS mins, list(mx ORDER BY d) AS maxs FROM dim
    ),
    enc AS (
      SELECT e.vec_id,
             list_transform(range(1, 65), d -> CASE
               WHEN p.maxs[d] = p.mins[d] THEN 0
               ELSE CAST(least(greatest(floor(
                 (e.embedding[d]::DOUBLE - p.mins[d]) / (p.maxs[d] - p.mins[d]) * 255
               ), 0), 255) AS INT) END) AS codes
      FROM embeddings e CROSS JOIN params p
    ),
    q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
    pairs AS (
      SELECT q.vec_id AS query_id, c.vec_id AS match_id,
             list_reduce(list_transform(range(1, 65), d ->
               (q.embedding[d]::DOUBLE - (p.mins[d] + c.codes[d] * ((p.maxs[d] - p.mins[d]) / 255.0)))
               * (q.embedding[d]::DOUBLE - (p.mins[d] + c.codes[d] * ((p.maxs[d] - p.mins[d]) / 255.0)))),
               (acc, x) -> acc + x) AS dist
      FROM q CROSS JOIN enc c CROSS JOIN params p
      WHERE c.vec_id <> q.vec_id
    ),
    ranked AS (
      SELECT query_id, match_id, round(dist, 6) AS dist,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY round(dist, 6) ASC, match_id ASC) AS rank
      FROM pairs
    )
    SELECT query_id, match_id, dist, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 5
"""


@q("ext_similarity_sq8", _SQ8_SQL)
def ext_similarity_sq8(spark, sf_dir):
    """8-bit scalar-quantized ANN: per-dimension min/max ranges, 4×
    compression, on-the-fly decode against full-precision queries.
    Complements PQ (less compression, lower distortion, no training);
    ranges are order statistics so the whole pipeline is oracle-exact."""
    from ..ext.similarity import sq8_topk

    e = load_table(spark, sf_dir, "embeddings")
    return sq8_topk(e, e.filter(F.col("vec_id") < 5), k=5)


# Balanced-sample oracle: literal centroids (seeded 6dp — identical
# doubles both engines), the same HOF distance folds as the PQ oracle,
# md5-of-id as the deterministic within-cluster shuffle.
def _cluster_sample_sql() -> str:
    from ..ext.similarity import pq_codebook_random

    cents = pq_codebook_random(m=1, k=16, sub_dim=64, seed=11)[0]
    cb_lit = (
        "[" + ", ".join("[" + ", ".join(f"{v:.6f}" for v in c) + "]" for c in cents) + "]"
    )
    return f"""
    WITH cbt AS (SELECT {cb_lit} AS cb),
    assigned AS (
      SELECT e.vec_id,
             CAST(list_position(
               list_transform(range(1, 17), c -> list_reduce(
                 list_transform(range(1, 65), j ->
                   (e.embedding[j]::DOUBLE - cb[c][j]) * (e.embedding[j]::DOUBLE - cb[c][j])),
                 (acc, x) -> acc + x)),
               list_min(
               list_transform(range(1, 17), c -> list_reduce(
                 list_transform(range(1, 65), j ->
                   (e.embedding[j]::DOUBLE - cb[c][j]) * (e.embedding[j]::DOUBLE - cb[c][j])),
                 (acc, x) -> acc + x)))) - 1 AS INT) AS cluster
      FROM embeddings e CROSS JOIN cbt
    ),
    ranked AS (
      SELECT vec_id, cluster,
             CAST(row_number() OVER (PARTITION BY cluster
                    ORDER BY md5(vec_id::VARCHAR), vec_id) AS INT) AS samp_rank
      FROM assigned
    )
    SELECT vec_id, cluster, samp_rank FROM ranked WHERE samp_rank <= 10
"""


@q("ext_cluster_balanced_sample", _cluster_sample_sql())
def ext_cluster_balanced_sample(spark, sf_dir):
    """Diversity-balanced subsample: vector-quantize to 16 centroids,
    keep 10 docs per cluster under a deterministic md5-of-id shuffle —
    the curation step that stops a training mix from being dominated
    by its densest embedding regions. Portable literal centroids put
    assignment + quota under the exact oracle; the trained-centroid
    path (ivf_build) is unit-tested."""
    from ..ext.similarity import cluster_balanced_sample, pq_codebook_random

    e = load_table(spark, sf_dir, "embeddings")
    cents = pq_codebook_random(m=1, k=16, sub_dim=64, seed=11)[0]
    return cluster_balanced_sample(e, cents, per_cluster=10)


# TF-IDF oracle: same determinism discipline as BM25 — integer tf/df/N,
# 6dp-quantized weights, decimal(18,6) sums for both the dot product
# and the squared norms (associative → partition-order-independent);
# ln/sqrt are IEEE-identical across engines.
_TFIDF_SQL = rf"""
    WITH q(query_id, query) AS (VALUES
      {", ".join(f"({i}, '{t}')" for i, t in _BM25_QUERIES)}),
    tok AS (
      SELECT doc_id,
             unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    stats AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
    dfreq AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY 1),
    wd AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln(s.n_docs::DOUBLE / d.dfreq), 6) AS w
      FROM tf JOIN dfreq d USING (term) CROSS JOIN stats s
    ),
    nd AS (
      SELECT doc_id,
             sqrt(CAST(sum(round(w * w, 6)::DECIMAL(18,6)) AS DOUBLE)) AS nd
      FROM wd GROUP BY 1
    ),
    qtok AS (
      SELECT query_id,
             unnest(string_split(lower(trim(regexp_replace(query, '\s+', ' ', 'g'))), ' ')) AS term
      FROM q
    ),
    qt AS (SELECT query_id, term, count(*) AS qtf FROM qtok GROUP BY 1, 2),
    wq AS (
      SELECT qt.query_id, qt.term,
             round(qt.qtf * ln(s.n_docs::DOUBLE / d.dfreq), 6) AS wq
      FROM qt JOIN dfreq d USING (term) CROSS JOIN stats s
    ),
    nq AS (
      SELECT query_id,
             sqrt(CAST(sum(round(wq * wq, 6)::DECIMAL(18,6)) AS DOUBLE)) AS nq
      FROM wq GROUP BY 1
    ),
    dots AS (
      SELECT wq.query_id, wd.doc_id,
             CAST(sum(round(wd.w * wq.wq, 6)::DECIMAL(18,6)) AS DOUBLE) AS dot
      FROM wd JOIN wq USING (term) GROUP BY 1, 2
    ),
    sc AS (
      SELECT d.query_id, d.doc_id, round(d.dot / (nd.nd * nq.nq), 6) AS score
      FROM dots d JOIN nd USING (doc_id) JOIN nq USING (query_id)
    ),
    r AS (
      SELECT query_id, doc_id AS match_id, score,
             row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
      FROM sc
    )
    SELECT query_id, match_id, score, CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 5
"""


@q("ext_retrieval_tfidf", _TFIDF_SQL)
def ext_retrieval_tfidf(spark, sf_dir):
    """TF-IDF cosine top-5 for the same three literal queries as BM25 —
    the classic sparse-vector ranking (w = tf·ln(N/df), cosine over the
    sparse weight vectors). Same inverted-index plan shape as BM25:
    one postings shuffle, vocabulary-bounded df table, broadcast query
    side; document norms aggregate from the postings table."""
    from ..ext.retrieval import tfidf_topk

    d = load_table(spark, sf_dir, "documents")
    qdf = spark.createDataFrame(_BM25_QUERIES, "query_id int, query string")
    return tfidf_topk(d, qdf, k=5)


@q(
    "ext_knn_graph",
    """
    WITH prod AS (
      SELECT a.vec_id AS src_id, b.vec_id AS match_id,
             unnest(a.embedding)::double AS x, unnest(b.embedding)::double AS y
      FROM embeddings a CROSS JOIN embeddings b WHERE b.vec_id <> a.vec_id),
    dots AS (
      SELECT src_id, match_id, sum(x * y) AS dot,
             sum(x * x) AS aa, sum(y * y) AS bb
      FROM prod GROUP BY 1, 2),
    scored AS (
      SELECT src_id, match_id, round(dot / (sqrt(aa) * sqrt(bb)), 6) AS cosine
      FROM dots),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY src_id ORDER BY cosine DESC, match_id ASC) AS rank
      FROM scored)
    SELECT src_id, match_id, cosine, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def ext_knn_graph(spark, sf_dir):
    """k-NN graph (every vector's top-5 cosine neighbors) routed
    through the IVF index at full probe, so the graph must equal the
    brute-force all-pairs result exactly — the same full-probe ≡ exact
    gate ext_similarity_ivf uses. Production runs nprobe ≪ n_centroids
    (candidates bounded by cell size × nprobe, never N²)."""
    from ..ext.similarity import knn_graph

    e = load_table(spark, sf_dir, "embeddings")
    out = knn_graph(e, k=5, n_centroids=8, max_iter=4)
    return out.withColumn("rank", F.col("rank").cast("int"))


# Hashed-linear-model oracle: bucket = first 60 bits of md5(token) mod
# dim; weight(bucket) = affine md5("w:<bucket>") map into [-1, 1]; both
# reproduce bit-for-bit in any engine with md5. Per-occurrence weights
# quantize to decimal(18,6) pre-sum.
_QUALITY_CLS_SQL = r"""
    WITH t AS (
      SELECT doc_id,
             unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
      FROM documents
    ),
    b AS (
      SELECT doc_id,
             ('0x' || substr(md5(tok), 1, 15))::BIGINT % 4096 AS bucket
      FROM t
    ),
    w AS (
      SELECT doc_id,
             round((('0x' || substr(md5('w:' || bucket::VARCHAR), 1, 15))::BIGINT % 2000001)
                   / 1000000.0 - 1.0, 6)::DECIMAL(18,6) AS w
      FROM b
    ),
    a AS (
      SELECT doc_id, count(*) AS n_tokens, CAST(sum(w) AS DOUBLE) AS sum_w
      FROM w GROUP BY 1
    )
    SELECT doc_id, n_tokens,
           sum_w / n_tokens AS quality_logit,
           round(1.0 / (1.0 + exp(-(sum_w / n_tokens))), 6) AS quality_prob
    FROM a
"""


@q("ext_quality_classifier", _QUALITY_CLS_SQL)
def ext_quality_classifier(spark, sf_dir):
    """Hashed bag-of-tokens linear quality model (fasttext-shaped):
    hashing-trick bucket per token, deterministic md5-derived weight
    vector, per-document mean logit + sigmoid. Pure Column exprs, one
    groupBy(doc) with map-side combine; trained weights drop in as a
    broadcast join on the bucket column."""
    from ..ext.text import hashed_linear_score

    d = load_table(spark, sf_dir, "documents")
    return hashed_linear_score(d, dim=4096)


# BPE oracle: k chained CTE stages, each replaying one merge round —
# pair counts from the marker-encoded vocab, (count desc, left, right)
# argmax, literal replace of \x02l\x03\x02r\x03 with \x02lr\x03. The
# marker encoding makes plain replace() the canonical greedy merge pass
# in Spark, DuckDB, and Python alike (see ext/bpe.py).
def _bpe_sql(k: int) -> str:
    parts = [r"""
    WITH w0 AS MATERIALIZED (
      SELECT regexp_replace(word, '(.)', chr(2) || '\1' || chr(3), 'g') AS enc,
             count(*) AS freq
      FROM (
        SELECT unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS word
        FROM documents) t
      WHERE word <> ''
      GROUP BY 1
    )"""]
    for i in range(k):
        parts.append(f"""
    , p{i} AS MATERIALIZED (
      SELECT u.l AS l, u.r AS r, CAST(sum(freq) AS BIGINT) AS cnt
      FROM (
        SELECT freq,
               unnest(list_transform(range(1, len(toks)),
                      j -> {{'l': toks[j], 'r': toks[j + 1]}})) AS u
        FROM (SELECT freq,
                     string_split(substr(enc, 2, len(enc) - 2),
                                  chr(3) || chr(2)) AS toks
              FROM w{i})
      ) GROUP BY 1, 2
    )
    , b{i} AS MATERIALIZED (SELECT l, r, cnt FROM p{i} ORDER BY cnt DESC, l ASC, r ASC LIMIT 1)
    , w{i + 1} AS MATERIALIZED (
      SELECT replace(enc,
                     (SELECT chr(2) || l || chr(3) || chr(2) || r || chr(3) FROM b{i}),
                     (SELECT chr(2) || l || r || chr(3) FROM b{i})) AS enc,
             freq
      FROM w{i})""")
    selects = "\n    UNION ALL\n".join(
        f"    SELECT CAST({i} AS INT) AS step, l AS \"left\", r AS \"right\", "
        f"l || r AS merged, cnt AS pair_count FROM b{i}"
        for i in range(k)
    )
    return "".join(parts) + "\n" + selects


@q("ext_bpe_train", _bpe_sql(12))
def ext_bpe_train(spark, sf_dir):
    """BPE tokenizer training: the top-12 merge rules learned from the
    corpus word-frequency table. One corpus pass builds the vocab
    frame; each round is a pair-count groupBy + argmax + map-only
    literal replace over |V| rows (the corpus is never rescanned).
    The driver-side per-round argmax is inherent to BPE (each merge
    depends on the last); everything heavy stays distributed."""
    from ..ext.bpe import bpe_train

    d = load_table(spark, sf_dir, "documents")
    _, mdf = bpe_train(d, n_merges=12)
    return mdf


def _bpe_segment_sql(k: int) -> str:
    base = _bpe_sql(k)
    # reuse the stage CTEs, then segment every document with the k
    # merges (nested literal replaces) and count subwords = #markers
    repl = "enc0"
    for i in range(k):
        repl = (f"replace({repl}, "
                f"(SELECT chr(2) || l || chr(3) || chr(2) || r || chr(3) FROM b{i}), "
                f"(SELECT chr(2) || l || r || chr(3) FROM b{i}))")
    # strip the final UNION ALL selects from the base — keep CTEs only
    ctes = base[: base.index("    SELECT CAST(0 AS INT)")]
    return (
        ctes
        + f"""
    , docs AS (
      SELECT doc_id,
             array_to_string(
               list_transform(
                 string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' '),
                 w -> regexp_replace(w, '(.)', chr(2) || '\\1' || chr(3), 'g')),
               chr(1)) AS enc0
      FROM documents)
    SELECT doc_id,
           CAST(len({repl}) - len(replace({repl}, chr(2), '')) AS INT) AS n_subwords
    FROM docs"""
    )


@q("ext_bpe_segment", _bpe_segment_sql(12))
def ext_bpe_segment(spark, sf_dir):
    """Segment the corpus with the learned BPE merges: per-document
    subword count under the exact oracle (the chain of k literal
    replaces is map-only, zero-shuffle, whole-stage codegen)."""
    from ..ext.bpe import bpe_apply, bpe_train

    d = load_table(spark, sf_dir, "documents")
    merges, _ = bpe_train(d, n_merges=12)
    return bpe_apply(d, merges).select(
        "doc_id", F.col("n_subwords").cast("int").alias("n_subwords")
    )


@q(
    "ext_shuffle_shards",
    """
    WITH k AS (
      SELECT doc_id, source, md5('shuffle-v1' || doc_id::VARCHAR) AS key,
             CAST(('0x' || substr(md5('shuffle-v1' || doc_id::VARCHAR), 1, 15))::BIGINT % 8 AS INT) AS shard
      FROM documents)
    SELECT doc_id, source, shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY key, doc_id) - 1 AS BIGINT) AS position
    FROM k
    """,
)
def ext_shuffle_shards(spark, sf_dir):
    """Deterministic global training-order shuffle: md5 sort key →
    shard (zero-shuffle Column) + in-shard position (one shuffle keyed
    by shard, each shard ranked independently — no global sort)."""
    from ..ext.splits import shuffle_shards

    d = load_table(spark, sf_dir, "documents")
    return shuffle_shards(d, n_shards=8).select(
        "doc_id", "source", "shard", "position"
    )


# Bigram-LM oracle: counts train on even doc_ids, every token's logp is
# a CASE over exact integer counts (ln of integer ratios — IEEE-equal),
# quantized to decimal(18,6) pre-sum; the mean is ONE unrounded IEEE
# division of the exact sum.
_BIGRAM_LM_SQL = r"""
    WITH base AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS l
      FROM documents),
    tok AS (
      SELECT doc_id, u.pos, u.v, u.u
      FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, len(l) + 1),
                 i -> {'pos': i - 1, 'v': l[i],
                       'u': CASE WHEN i > 1 THEN l[i - 1] END})) AS u
        FROM base)),
    uni AS (
      SELECT v, count(*) AS cv FROM tok WHERE doc_id % 2 = 0 GROUP BY v),
    big AS (
      SELECT u, v, count(*) AS cuv FROM tok
      WHERE doc_id % 2 = 0 AND pos > 0 GROUP BY u, v),
    tot AS (SELECT sum(cv) AS T FROM uni),
    scored AS (
      SELECT t.doc_id,
             CASE
               WHEN t.pos = 0 AND uni.cv IS NOT NULL THEN ln(uni.cv / tot.T)
               WHEN t.pos = 0 THEN ln(0.4 / tot.T)
               WHEN big.cuv IS NOT NULL THEN ln(big.cuv / cu.cv)
               WHEN uni.cv IS NOT NULL THEN ln(0.4 * uni.cv / tot.T)
               ELSE ln(0.4 / tot.T)
             END AS lp,
             CASE WHEN t.pos > 0 AND big.cuv IS NULL AND uni.cv IS NOT NULL
                  THEN 1 ELSE 0 END AS is_backoff,
             CASE WHEN uni.cv IS NULL THEN 1 ELSE 0 END AS is_oov
      FROM tok t
      LEFT JOIN uni ON uni.v = t.v
      LEFT JOIN uni cu ON cu.v = t.u
      LEFT JOIN big ON big.u = t.u AND big.v = t.v
      CROSS JOIN tot),
    agg AS (
      SELECT doc_id, count(*) AS n_tokens,
             CAST(sum(round(lp, 6)::DECIMAL(18,6)) AS DOUBLE) AS sum_logp,
             CAST(sum(is_backoff) AS BIGINT) AS n_backoff,
             CAST(sum(is_oov) AS BIGINT) AS n_oov
      FROM scored GROUP BY doc_id)
    SELECT doc_id, n_tokens, sum_logp, sum_logp / n_tokens AS mean_logp,
           n_backoff, n_oov
    FROM agg
"""


@q("ext_bigram_logprob", _BIGRAM_LM_SQL)
def ext_bigram_logprob(spark, sf_dir):
    """Bigram LM scoring with stupid backoff, trained on the even half
    of the corpus and scored on all of it — the held-out perplexity
    filter (unseen bigrams/tokens exercise the backoff and OOV paths).
    Bigram table shuffles on its (u, v) key (O(tokens) worst case — not
    broadcast); the vocab-sized unigram table broadcasts."""
    from ..ext.text import bigram_logprob

    d = load_table(spark, sf_dir, "documents")
    return bigram_logprob(d)


@q(
    "ext_cluster_top_terms",
    r"""
    WITH d AS (
      SELECT e.label AS cluster,
             unnest(string_split(lower(trim(regexp_replace(doc.text, '\s+', ' ', 'g'))), ' ')) AS term
      FROM documents doc JOIN embeddings e ON e.vec_id = doc.doc_id),
    tf AS (SELECT cluster, term, count(*) AS tf FROM d GROUP BY 1, 2),
    fr AS (SELECT term, sum(tf) AS f FROM tf GROUP BY 1),
    stats AS (SELECT sum(tf) AS W, count(DISTINCT cluster) AS C FROM tf),
    sc AS (
      SELECT tf.cluster, tf.term, tf.tf, CAST(fr.f AS BIGINT) AS f,
             round(tf.tf * ln(1.0 + (s.W / s.C) / fr.f), 6) AS score
      FROM tf JOIN fr USING (term) CROSS JOIN stats s),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY cluster
                                   ORDER BY score DESC, term ASC) AS rank
      FROM sc)
    SELECT cluster, term, tf, f, score, CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 5
    """,
)
def ext_cluster_top_terms(spark, sf_dir):
    """c-TF-IDF cluster labeling: top-5 characteristic terms per
    embedding-label cluster — tf(t,c)·ln(1 + A/f(t)), the BERTopic
    class-TF-IDF. One explode+groupBy shuffle; everything downstream
    runs on the clusters×vocab frame."""
    from ..ext.text import cluster_top_terms

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    joined = d.join(
        e.select(F.col("vec_id").alias("doc_id"), F.col("label").alias("cluster")),
        "doc_id",
    )
    return cluster_top_terms(joined)


# Residual IVF-PQ oracle: portable literal centroids + codebook make
# EVERY stage SQL-replayable — cell argmin, residuals, codes, the
# sorted-struct probe selection, per-cell query LUTs, and the ADC sum.
# Unlike the full-probe-only gates of the non-residual rows, this
# oracle checks the PARTIAL-probe (nprobe=4 of 16) routing itself.
def _ivfpq_residual_sql() -> str:
    from ..ext.similarity import pq_codebook_random

    cents = pq_codebook_random(m=1, k=16, sub_dim=64, seed=11)[0]
    cb = pq_codebook_random(m=8, k=16, sub_dim=8)
    cn_lit = (
        "[" + ", ".join("[" + ", ".join(f"{v:.6f}" for v in c) + "]" for c in cents) + "]"
    )
    cb_lit = (
        "["
        + ", ".join(
            "[" + ", ".join("[" + ", ".join(f"{v:.6f}" for v in cent) + "]" for cent in sub)
            + "]"
            for sub in cb
        )
        + "]"
    )
    cell_dist = (
        "list_transform(range(1, 17), c -> list_reduce("
        "list_transform(range(1, 65), j -> "
        "(e.embedding[j]::DOUBLE - cn[c][j]) * (e.embedding[j]::DOUBLE - cn[c][j])), "
        "(acc, x) -> acc + x))"
    )
    code_term = lambda src, j: (
        f"({src}[t.s*8+{j + 1}] - cb[t.s+1][c][{j + 1}]) * "
        f"({src}[t.s*8+{j + 1}] - cb[t.s+1][c][{j + 1}])"
    )
    code_dist = lambda src: " + ".join(code_term(src, j) for j in range(8))
    adc = " + ".join(f"l.lut[{s + 1}][c.codes[{s + 1}]+1]" for s in range(8))
    return f"""
    WITH cbt AS MATERIALIZED (SELECT {cb_lit} AS cb),
    cnt AS MATERIALIZED (SELECT {cn_lit} AS cn),
    cd AS MATERIALIZED (
      SELECT e.vec_id, e.embedding, {cell_dist} AS cdists
      FROM embeddings e CROSS JOIN cnt),
    assigned AS MATERIALIZED (
      SELECT vec_id, embedding, cdists,
             CAST(list_position(cdists, list_min(cdists)) - 1 AS INT) AS cell
      FROM cd),
    resid AS MATERIALIZED (
      SELECT a.vec_id, a.cell,
             list_transform(range(1, 65),
               j -> a.embedding[j]::DOUBLE - cn[a.cell + 1][j]) AS r
      FROM assigned a CROSS JOIN cnt),
    dl AS MATERIALIZED (
      SELECT r.vec_id, r.cell, t.s,
             list_transform(range(1, 17), c -> {code_dist('r.r')}) AS dists
      FROM resid r CROSS JOIN cbt CROSS JOIN range(0, 8) t(s)),
    codesl AS MATERIALIZED (
      SELECT vec_id, cell, list(CAST(list_position(dists, list_min(dists)) - 1 AS INT)
                                ORDER BY s) AS codes
      FROM dl GROUP BY vec_id, cell),
    qprobe AS MATERIALIZED (
      SELECT vec_id AS query_id, embedding,
             unnest(list_transform(
               list_sort(list_transform(range(1, 17),
                 c -> {{'d': cdists[c], 'i': c - 1}}))[1:4],
               s -> s['i'])) AS cell
      FROM assigned WHERE vec_id < 5),
    qres AS MATERIALIZED (
      SELECT q.query_id, q.cell,
             list_transform(range(1, 65),
               j -> q.embedding[j]::DOUBLE - cn[q.cell + 1][j]) AS r
      FROM qprobe q CROSS JOIN cnt),
    qdl AS MATERIALIZED (
      SELECT q.query_id, q.cell, t.s,
             list_transform(range(1, 17), c -> {code_dist('q.r')}) AS dists
      FROM qres q CROSS JOIN cbt CROSS JOIN range(0, 8) t(s)),
    lut AS MATERIALIZED (
      SELECT query_id, cell, list(dists ORDER BY s) AS lut
      FROM qdl GROUP BY query_id, cell),
    pairs AS (
      SELECT l.query_id, c.vec_id AS match_id, {adc} AS adc
      FROM lut l JOIN codesl c ON c.cell = l.cell AND c.vec_id <> l.query_id),
    ranked AS (
      SELECT query_id, match_id, round(adc, 6) AS adc,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY round(adc, 6) ASC, match_id ASC) AS rank
      FROM pairs)
    SELECT query_id, match_id, adc, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 5
"""


@q("ext_similarity_ivfpq_residual", _ivfpq_residual_sql())
def ext_similarity_ivfpq_residual(spark, sf_dir):
    """Residual IVF-PQ (the FAISS IVFPQ formulation) at PARTIAL probe
    (nprobe=4 of 16): codes are PQ over x − c(cell), queries carry one
    ADC table per probed cell over q − c(cell). With portable literal
    centroids the approximate routing itself sits under the exact
    oracle — cell argmin, probe selection, residual codes, ADC sum."""
    from ..ext.similarity import ivf_pq_residual_topk, pq_codebook_random

    e = load_table(spark, sf_dir, "embeddings")
    cents = pq_codebook_random(m=1, k=16, sub_dim=64, seed=11)[0]
    cb = pq_codebook_random(m=8, k=16, sub_dim=8)
    return ivf_pq_residual_topk(
        e, e.filter(F.col("vec_id") < 5), cents, cb, k=5, nprobe=4
    )


@q(
    "ext_repeated_spans",
    r"""
    WITH base AS (
      SELECT doc_id,
             string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      FROM documents),
    wins AS (
      SELECT doc_id, u.pos, u.wh
      FROM (
        SELECT doc_id,
               unnest(list_transform(range(1, greatest(len(t), 6) - 6 + 2),
                 i -> {'pos': i - 1,
                       'wh': md5(array_to_string(t[i:i+5], ' '))})) AS u
        FROM base)),
    dup AS (
      SELECT wh FROM wins GROUP BY wh HAVING count(DISTINCT doc_id) >= 2),
    flagged AS (
      SELECT w.doc_id, w.pos FROM wins w JOIN dup USING (wh)),
    isl AS (
      SELECT doc_id, pos,
             sum(CASE WHEN prev IS NULL OR pos - prev > 6 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS g
      FROM (
        SELECT doc_id, pos,
               lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM flagged))
    SELECT doc_id, min(pos) AS span_start, max(pos) + 6 AS span_end,
           count(*) AS n_windows
    FROM isl GROUP BY doc_id, g
    """,
)
def ext_repeated_spans(spark, sf_dir):
    """Substring-level duplicate spans: 6-token sliding-window md5
    hashes, windows shared by ≥2 documents, merged into maximal
    per-document token ranges (gaps-and-islands). The
    excision-granularity complement to whole-line span_dedup."""
    from ..ext.dedup import repeated_span_ranges

    d = load_table(spark, sf_dir, "documents")
    return repeated_span_ranges(d, k=6)


@q(
    "ext_temperature_mix",
    """
    WITH counts AS (
      SELECT source, count(*) AS n FROM documents GROUP BY source),
    w AS (
      SELECT source, n,
             sqrt(n::DOUBLE) / (SELECT sum(sqrt(n::DOUBLE)) FROM counts) AS share
      FROM counts),
    cuts AS (
      SELECT source,
             CAST(floor(least(1.0, share * 300.0 / n) * 10000) AS INT) AS keep_cut
      FROM w)
    SELECT d.doc_id, d.source, c.keep_cut
    FROM documents d JOIN cuts c USING (source)
    WHERE ('0x' || substr(md5('tmix-v1' || d.doc_id::VARCHAR), 1, 4))::BIGINT % 10000
          < c.keep_cut
    """,
)
def ext_temperature_mix(spark, sf_dir):
    """α=0.5 temperature sampling to a 300-row budget: small sources
    up-weighted by sqrt(N) shares, kept via the deterministic
    md5-bucket filter (exact over the bucket space, stable, no RNG)."""
    from ..ext.splits import temperature_mix

    d = load_table(spark, sf_dir, "documents")
    return temperature_mix(d, target_total=300, alpha=0.5).select(
        "doc_id", "source", "keep_cut"
    )


@q(
    "ext_heavy_hitters",
    """
    WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
    r AS (SELECT user_id, cnt,
                 CAST(row_number() OVER (ORDER BY cnt DESC, user_id ASC) AS INT) AS rank
          FROM c)
    SELECT user_id, cnt, rank FROM r WHERE rank <= 10
    """,
)
def ext_heavy_hitters(spark, sf_dir):
    """Top-10 most active users via the two-pass sketch path:
    Misra-Gries partition summaries (O(capacity) state, no raw-key
    shuffle) propose candidates, an exact broadcast-semi-join recount
    ranks them. Lossless capacity here (>= distinct keys) makes the
    result equal the exact groupBy top-k — the oracle configuration;
    the eviction/recall behavior under tight capacity is unit-tested."""
    from ..ext.freq import heavy_hitters
    from ..sources.io import load_table

    e = load_table(spark, sf_dir, "events")
    return heavy_hitters(e, "user_id", k=10, capacity=4096)


@q(
    "ext_pmi_collocations",
    r"""
    WITH base AS (
      SELECT string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS t
      FROM documents),
    uni AS (
      SELECT w, count(*) AS cw
      FROM (SELECT unnest(t) AS w FROM base) GROUP BY w),
    big AS (
      SELECT p['u'] AS u, p['v'] AS v, count(*) AS cuv
      FROM (
        SELECT unnest(list_transform(range(1, greatest(len(t), 2)),
                 i -> {'u': t[i], 'v': t[i + 1]})) AS p
        FROM base)
      GROUP BY 1, 2 HAVING count(*) >= 5),
    tot AS (SELECT sum(cw) AS T FROM uni),
    sc AS (
      SELECT b.u, b.v, b.cuv, cu.cw AS cu, cv.cw AS cv,
             round(ln(b.cuv * t.T / (cu.cw::DOUBLE * cv.cw)), 6) AS pmi
      FROM big b JOIN uni cu ON cu.w = b.u JOIN uni cv ON cv.w = b.v
      CROSS JOIN tot t),
    r AS (
      SELECT *, CAST(row_number() OVER (ORDER BY pmi DESC, u ASC, v ASC) AS INT) AS rank
      FROM sc)
    SELECT u, v, cuv, cu, cv, pmi, rank FROM r WHERE rank <= 20
    """,
)
def ext_pmi_collocations(spark, sf_dir):
    """Top-20 adjacent-pair collocations by pointwise mutual
    information (min count 5) — corpus phrase mining over the same
    unigram/bigram count frames the LM family builds."""
    from ..ext.text import pmi_collocations

    d = load_table(spark, sf_dir, "documents")
    return pmi_collocations(d, top_n=20, min_count=5)


@q(
    "ext_gopher_rules",
    """
    WITH t AS (
      SELECT doc_id,
             regexp_split_to_array(trim(text), '\\s+') AS w,
             length(regexp_replace(text, '\\s', '', 'g')) AS nonws,
             length(text) - length(replace(text, '#', '')) AS hash_cnt,
             (length(text) - length(replace(text, '...', ''))) / 3 AS ell_cnt,
             string_split(text, chr(10)) AS lines
      FROM documents),
    f AS (
      SELECT doc_id,
             len(w) AS n,
             nonws / len(w) AS mean_len,
             (hash_cnt + ell_cnt) / len(w) AS sym_ratio,
             len(list_filter(lines, l -> regexp_matches(l, '^\\s*[-*•]')))
               / len(lines) AS bullet_frac,
             len(list_filter(lines, l -> regexp_matches(l, '\\.\\.\\.\\s*$')))
               / len(lines) AS ell_frac,
             len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
               / len(w) AS alpha_frac,
             len(list_intersect(list_distinct(list_transform(w, x -> lower(x))),
                 ['the','be','to','of','and','that','have','with'])) AS stop_d
      FROM t)
    SELECT doc_id,
           n >= 50 AND n <= 100000 AS r_word_count,
           mean_len >= 3 AND mean_len <= 10 AS r_mean_word_len,
           sym_ratio <= 0.1 AS r_symbol_ratio,
           bullet_frac < 0.9 AS r_bullet_lines,
           ell_frac < 0.3 AS r_ellipsis_lines,
           alpha_frac >= 0.8 AS r_alpha_words,
           stop_d >= 2 AS r_stop_words,
           (n >= 50 AND n <= 100000) AND (mean_len >= 3 AND mean_len <= 10)
             AND sym_ratio <= 0.1 AND bullet_frac < 0.9 AND ell_frac < 0.3
             AND alpha_frac >= 0.8 AND stop_d >= 2 AS keep
    FROM f
    """,
)
def ext_gopher_rules(spark, sf_dir):
    """Gopher rule-set document filter (Rae et al. 2021) — the named
    quality-filter stage of a pretraining pipeline, distinct from the
    composite score in `ext_text_quality`: each published rule is its
    own boolean flag plus the combined keep decision. Pure per-row
    Column arithmetic — a map-only pass fused into the scan; filtering
    100 TB costs exactly one corpus read (`pkg/ext/text.py`
    gopher_rules)."""
    from ..ext.text import gopher_rules

    d = load_table(spark, sf_dir, "documents")
    out = gopher_rules(d)
    return out.select(
        "doc_id", "r_word_count", "r_mean_word_len", "r_symbol_ratio",
        "r_bullet_lines", "r_ellipsis_lines", "r_alpha_words",
        "r_stop_words", "keep",
    )


@q(
    "ext_c4_clean",
    """
    WITH t AS (
      SELECT doc_id, text,
             list_filter(string_split(text, chr(10)),
               l -> regexp_matches(l, '[.!?"]\\s*$')
                    AND len(regexp_split_to_array(trim(l), '\\s+')) >= 5) AS kept
      FROM documents),
    c AS (
      SELECT doc_id, text, kept,
             coalesce(array_to_string(kept, chr(10)), '') AS clean
      FROM t)
    SELECT doc_id,
           len(kept) AS c4_n_kept_lines,
           len(regexp_split_to_array(clean, '[.!?]')) - 1 AS c4_n_sentences,
           contains(lower(text), 'lorem ipsum') AS c4_has_lorem,
           contains(text, '{') OR contains(text, '}') AS c4_has_brace,
           (len(regexp_split_to_array(clean, '[.!?]')) - 1) >= 3
             AND NOT contains(lower(text), 'lorem ipsum')
             AND NOT (contains(text, '{') OR contains(text, '}')) AS c4_keep,
           md5(clean) AS c4_text_md5
    FROM c
    """,
)
def ext_c4_clean(spark, sf_dir):
    """C4-style corpus cleaning (Raffel et al. 2020) — the line-level
    terminal-punctuation filter plus the document rules (≥3 sentences,
    no 'lorem ipsum', no braces), the second canonical named cleaning
    stage beside `ext_gopher_rules`. The cleaned text itself is
    hash-compared (md5) so the oracle pins the exact line filtering,
    not just the counts. In-row transform/filter lambdas — map-only at
    any scale (`pkg/ext/text.py` c4_clean)."""
    from ..ext.text import c4_clean

    d = load_table(spark, sf_dir, "documents")
    out = c4_clean(d)
    return out.select(
        "doc_id", "c4_n_kept_lines", "c4_n_sentences", "c4_has_lorem",
        "c4_has_brace", "c4_keep", F.md5("c4_text").alias("c4_text_md5"),
    )


@q(
    "ext_dsir_importance",
    r"""
    WITH t AS (
      SELECT doc_id, source = 'src0' AS is_t,
             string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS toks
      FROM documents),
    g AS (
      SELECT doc_id, is_t, unnest(toks) AS gram FROM t
      UNION ALL
      SELECT doc_id, is_t,
             unnest(list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i + 1])) AS gram
      FROM t),
    gb AS (
      SELECT doc_id, is_t,
             ('0x' || substr(md5(gram), 1, 15))::BIGINT % 4096 AS bucket
      FROM g),
    cnt AS (
      SELECT bucket, count(*) AS cr,
             sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct
      FROM gb GROUP BY bucket),
    tots AS (SELECT sum(cr) AS tr, sum(ct) AS tt FROM cnt),
    wts AS (
      SELECT bucket,
             round(ln((ct + 0.5) / (tt + 0.5 * 4096))
                   - ln((cr + 0.5) / (tr + 0.5 * 4096)), 9)::DECIMAL(18,9) AS dq
      FROM cnt CROSS JOIN tots)
    SELECT doc_id, count(*) AS n_grams,
           (sum(dq))::DOUBLE AS log_weight
    FROM gb JOIN wts USING (bucket)
    GROUP BY doc_id
    """,
)
def ext_dsir_importance(spark, sf_dir):
    """DSIR importance weights (hashed unigram+bigram models, target =
    source 'src0'): log p_target(x) − p_raw(x) per document, for
    importance resampling toward the target domain. The 4096-bucket
    log-ratio table broadcasts; bucket deltas are decimal-quantized so
    the per-doc sum is associative — the oracle is bit-exact."""
    from ..ext.text import dsir_importance

    d = load_table(spark, sf_dir, "documents")
    return dsir_importance(d)


@q(
    "ext_ccnet_buckets",
    r"""
    WITH tok AS (
      SELECT doc_id,
             unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS token
      FROM documents),
    freq AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
    tot AS (SELECT sum(cnt) AS total FROM freq),
    scored AS (
      SELECT doc_id, count(*) AS n_tokens,
             round(avg(ln(cnt / total)), 6) AS logprob_mean
      FROM tok JOIN freq USING (token) CROSS JOIN tot
      GROUP BY doc_id)
    SELECT d.doc_id, d.lang, s.n_tokens, s.logprob_mean,
           ntile(3) OVER (PARTITION BY d.lang
                          ORDER BY s.logprob_mean DESC, d.doc_id) AS ppl_bucket
    FROM documents d JOIN scored s ON s.doc_id = d.doc_id
    """,
)
def ext_ccnet_buckets(spark, sf_dir):
    """CCNet perplexity bucketing: corpus unigram-LM score → per-lang
    equal-frequency head/middle/tail buckets (1 = most LM-typical).
    Scores are rounded before ranking with doc_id tie-break, so the
    NTILE order is total and the oracle reproduces every boundary."""
    from ..ext.text import ccnet_perplexity_buckets

    d = load_table(spark, sf_dir, "documents")
    return ccnet_perplexity_buckets(d)


@q(
    "ext_embedding_rp",
    """
    SELECT vec_id, j AS dim,
           list_reduce(
             list_prepend(0.0, list_transform(range(0, 64), i ->
               CAST(embedding[i + 1] AS DOUBLE) *
               (CASE WHEN substring(
                        md5(i::VARCHAR || ':' || j::VARCHAR || ':7'), 1, 1)
                       IN ('0','2','4','6','8','a','c','e')
                     THEN 1.0 / sqrt(16.0)
                     ELSE -(1.0 / sqrt(16.0)) END))),
             (a, b) -> a + b) AS rp
    FROM embeddings CROSS JOIN range(16) t(j)
    """,
)
def ext_embedding_rp(spark, sf_dir):
    """Johnson-Lindenstrauss random projection 64-d → 16-d: the cheap
    map-only compression pass before ANN indexing / clustering. The
    ±1/√k sign matrix is an md5-parity plan literal; each output
    coordinate is a fixed-order double fold seeded with +0.0, so the
    Spark aggregate and the oracle's list_reduce replay the identical
    IEEE operation sequence (no quantization needed)."""
    from ..ext.similarity import random_projection

    e = load_table(spark, sf_dir, "embeddings")
    return random_projection(e, k=16, dims=64, seed=7)


def _logreg_oracle_sql(iters: int = 5, lr: float = 0.5) -> str:
    """Chained-CTE replay of logreg_quality_train: iteration t's
    gradient aggregate reads the weights CTE of iteration t-1, exactly
    mirroring the engine's per-pass collect-update loop (the BPE
    k-stage-merge oracle pattern applied to gradient descent)."""
    toks = (
        "string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')"
    )
    ctes = [
        f"base AS (SELECT source, text, {toks} AS l FROM documents)",
        "feat AS (SELECT"
        " CASE WHEN source = 'src0' THEN 1.0 ELSE 0.0 END AS y,"
        " length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) / length(text) AS x1,"
        " least(len(list_filter(l, t -> t IN ('the','and','of','to'))) / len(l)"
        " / 0.2, 1.0) AS x2,"
        " len(list_distinct(l)) / len(l) AS x3"
        " FROM base WHERE length(text) > 0 AND len(l) > 0)",
        "it0 AS (SELECT 0.0 AS w1, 0.0 AS w2, 0.0 AS w3, 0.0 AS w4)",
    ]
    p = ("greatest(0.0, least(1.0,"
         " 0.25 * (w1 * x1 + w2 * x2 + w3 * x3 + w4) + 0.5))")

    def s(term: str) -> str:
        return f"CAST(sum(round(({p} - y) * {term}, 9)::DECIMAL(18,9)) AS DOUBLE)"

    selects = []
    for t in range(1, iters + 1):
        ctes.append(
            f"g{t} AS (SELECT count(*) AS n, {s('x1')} AS g1, {s('x2')} AS g2,"
            f" {s('x3')} AS g3, {s('1.0')} AS g4,"
            f" CAST(sum(round(({p} - y) * ({p} - y), 9)::DECIMAL(18,9)) AS DOUBLE)"
            f" AS sse FROM feat CROSS JOIN it{t - 1})"
        )
        ctes.append(
            f"it{t} AS (SELECT"
            f" it{t - 1}.w1 - {lr} * (g{t}.g1 / g{t}.n) AS w1,"
            f" it{t - 1}.w2 - {lr} * (g{t}.g2 / g{t}.n) AS w2,"
            f" it{t - 1}.w3 - {lr} * (g{t}.g3 / g{t}.n) AS w3,"
            f" it{t - 1}.w4 - {lr} * (g{t}.g4 / g{t}.n) AS w4"
            f" FROM g{t} CROSS JOIN it{t - 1})"
        )
        selects.append(
            f"SELECT {t} AS iter, g{t}.n AS n, it{t}.w1 AS w_alpha,"
            f" it{t}.w2 AS w_stop, it{t}.w3 AS w_distinct, it{t}.w4 AS w_bias,"
            f" g{t}.sse AS sse FROM g{t} CROSS JOIN it{t}"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


@q("ext_quality_logreg_train", _logreg_oracle_sql())
def ext_quality_logreg_train(spark, sf_dir):
    """Full-batch gradient-descent training of a curated-vs-raw
    logistic quality classifier (hard-sigmoid; 5 passes). Each pass is
    one map-side-combinable corpus aggregate collapsing to a single
    row — the 100 TB shape of classifier training without MLlib."""
    from ..ext.text import logreg_quality_train

    d = load_table(spark, sf_dir, "documents")
    return logreg_quality_train(d, iters=5, lr=0.5)
