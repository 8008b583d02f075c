"""Similarity search over embedding columns (``array<float>``).

- :func:`brute_force_topk` — exact cosine top-k; the correctness
  baseline. The dot product is a JVM-side ``zip_with`` + left-fold
  ``aggregate`` (no Python, no UDF); top-k is a per-query
  ``row_number`` window, so only k rows per query survive the shuffle.
- :func:`lsh_bucket_topk` — the scale path: random-hyperplane LSH.
  Hyperplane signs come from seeded ``xxhash64(vec_id-free index,
  dim)`` pseudo-projections, so signatures are deterministic without
  shipping a projection matrix. Queries only compare against
  same-bucket candidates (multi-probe over ``n_tables`` tables),
  turning O(N·Q) into O(candidates).
- :func:`embedding_near_dup_pairs` — near-dup by cosine ≥ threshold
  over LSH buckets.
- :func:`ivf_build` / :func:`ivf_topk` — IVF: a k-means|| coarse
  quantizer partitions the corpus into cells; queries probe their
  ``nprobe`` nearest cells only. The cell-partitioned corpus is what
  you persist at scale (bucket by ``centroid_id``); full probe
  degenerates to exact brute force (the test invariant).

At 100 TB the corpus side is the big table: all entry points keep it
shuffle-keyed by bucket/cell/query id and never collect embeddings to
the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W, functions as F


def _dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a left-to-right double fold (deterministic order)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm2(a: Column) -> Column:
    return F.aggregate(
        a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )


def cosine_similarity_col(a: Column, b: Column) -> Column:
    """cos(a, b) = a·b / (‖a‖·‖b‖), computed in double."""
    return _dot(a, b) / (F.sqrt(_norm2(a)) * F.sqrt(_norm2(b)))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query vector (excluding self-matches).

    ``queries`` is expected to be small (it broadcasts); the corpus
    streams through the crossJoin without materializing on the driver.
    """
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("_qvec")
    )
    pairs = corpus.crossJoin(F.broadcast(q)).filter(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = pairs.withColumn(
        "cosine", cosine_similarity_col(F.col("_qvec"), F.col(vec_col))
    )
    w = W.partitionBy(query_id_col).orderBy(
        F.desc(F.round("cosine", 6)), F.asc(id_col)
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(query_id_col, F.col(id_col).alias("match_id"),
                F.round("cosine", 6).alias("cosine"), F.col("_rn").alias("rank"))
    )


def _lsh_signature(
    vec_col: Column, dims: int, planes: int, seed: int, hash_mode: str = "xxhash64"
) -> Column:
    """Random-hyperplane signature: sign pattern of ``planes``
    pseudo-projections.

    Plane p's weight for dimension d is a deterministic pseudo-random
    value in [-3, 3] derived from a hash of (d, p, seed) — generated
    JVM-side per row without a broadcast matrix. Good enough bucketing
    for LSH (angles preserved in expectation), fully reproducible.

    ``hash_mode="md5"`` derives the weight from the md5 hex digest of
    ``"d:p:seed"`` instead of xxhash64 — reproducible in any SQL
    engine. The projection itself is a left-to-right double fold, which
    ``list_reduce`` replays in the same association order, so bucket
    ids are engine-portable (the MinHash/SimHash oracle trick applied
    to embeddings).
    """

    def _weight(d: Column, p: int):
        if hash_mode == "xxhash64":
            h = F.xxhash64(d, F.lit(p), F.lit(seed))
        elif hash_mode == "md5":
            key = F.concat_ws(
                ":", d.cast("string"), F.lit(str(p)), F.lit(str(seed))
            )
            h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
        else:
            raise ValueError(f"unknown hash_mode {hash_mode!r}")
        return (F.pmod(h, F.lit(7)) - F.lit(3)).cast("double")

    def _term(p: int):
        return lambda x, d: x.cast("double") * _weight(d, p)

    bits = []
    for p in range(planes):
        proj = F.aggregate(
            F.zip_with(
                vec_col,
                F.sequence(F.lit(0), F.lit(dims - 1)),
                _term(p),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(1 << p))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dims: int = 64,
    planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate cosine top-k: compare only within matching LSH
    buckets across ``n_tables`` independent tables.

    Recall improves with n_tables; cost is the bucket-join fan-out
    instead of the full cross product.
    """
    def with_sigs(df, ident):
        out = df.select(F.col(id_col).alias(ident), F.col(vec_col).alias(f"_v_{ident}"))
        sigs = F.array(
            *[
                F.struct(
                    F.lit(t).alias("table"),
                    _lsh_signature(F.col(f"_v_{ident}"), dims, planes, seed=t).alias("bucket"),
                )
                for t in range(n_tables)
            ]
        )
        return out.select(ident, f"_v_{ident}", F.explode(sigs).alias("_s")).select(
            ident, f"_v_{ident}", F.col("_s.table").alias("table"), F.col("_s.bucket").alias("bucket")
        )

    c = with_sigs(corpus, "match_id")
    qs = with_sigs(queries, query_id_col)
    cand = (
        c.join(qs, ["table", "bucket"])
        .filter(F.col("match_id") != F.col(query_id_col))
        .select(query_id_col, "match_id", f"_v_{query_id_col}", "_v_match_id")
        .distinct()
    )
    scored = cand.withColumn(
        "cosine",
        cosine_similarity_col(F.col(f"_v_{query_id_col}"), F.col("_v_match_id")),
    )
    w = W.partitionBy(query_id_col).orderBy(F.desc(F.round("cosine", 6)), F.asc("match_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(query_id_col, "match_id", F.round("cosine", 6).alias("cosine"),
                F.col("_rn").alias("rank"))
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    planes: int = 8,
    n_tables: int = 4,
    exact: bool = False,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold).

    ``exact=True`` does the full O(N²) pair scan (oracle/baseline);
    default goes through LSH buckets (the 100 TB path).
    ``hash_mode="md5"`` makes the bucketed path engine-portable (see
    :func:`_lsh_signature`) so the approximate operator itself is
    oracle-checkable.
    """
    a = df.select(F.col(id_col).alias("a"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("b"), F.col(vec_col).alias("_vb"))
    if exact:
        cand = a.crossJoin(b).filter(F.col("a") < F.col("b"))
    else:
        def sigs(d, ident, vname):
            arr = F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table"),
                        _lsh_signature(
                            F.col(vname), dims, planes, seed=t, hash_mode=hash_mode
                        ).alias("bucket"),
                    )
                    for t in range(n_tables)
                ]
            )
            return d.select(ident, vname, F.explode(arr).alias("_s")).select(
                ident, vname, F.col("_s.table").alias("table"), F.col("_s.bucket").alias("bucket")
            )

        cand = (
            sigs(a, "a", "_va")
            .join(sigs(b, "b", "_vb"), ["table", "bucket"])
            .filter(F.col("a") < F.col("b"))
            .select("a", "b", "_va", "_vb")
            .distinct()
        )
    out = cand.withColumn(
        "cosine", F.round(cosine_similarity_col(F.col("_va"), F.col("_vb")), 6)
    )
    return out.filter(F.col("cosine") >= threshold).select("a", "b", "cosine")


# --------------------------------------------------------------------- IVF


def ivf_build(
    corpus: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
):
    """Train an IVF coarse quantizer and partition the corpus by cell.

    The quantizer is MLlib k-means|| (JVM, distributed, seeded); the
    corpus assignment is ``model.transform`` — one scan, no Python.
    Returns ``(indexed_corpus, centroids)`` where ``indexed_corpus``
    carries a ``centroid_id`` column and ``centroids`` is the small
    (n_centroids × dims) list the query side broadcasts.

    At scale the indexed corpus is what you persist (partitioned /
    bucketed by ``centroid_id``), so a query touches only the probed
    cells — the inverted-file idea: O(candidates) not O(N·Q).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = corpus.withColumn(
        "_features", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    km = KMeans(
        k=n_centroids, seed=seed, maxIter=max_iter,
        featuresCol="_features", predictionCol="centroid_id",
    )
    model = km.fit(feat)
    indexed = model.transform(feat).drop("_features")
    centroids = [c.tolist() for c in model.clusterCenters()]
    return indexed, centroids


def ivf_topk(
    indexed_corpus: DataFrame,
    centroids: list[list[float]],
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate cosine top-k via IVF: each query probes its
    ``nprobe`` nearest cells and scores only those cells' vectors.

    Probe assignment is one Arrow-batched pandas UDF on the (small)
    query side — a Q×C matrix multiply per batch; the corpus side never
    runs Python. The candidate join is keyed on ``centroid_id``; cell
    imbalance is the skew axis (AQE skew-join splits hot cells).

    With ``nprobe == n_centroids`` every cell is probed, so the result
    is exactly :func:`brute_force_topk` (the unit-test invariant).
    """
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)  # (m, d)
    nprobe = min(nprobe, len(centroids))
    c_sq = (C * C).sum(axis=1)

    @pandas_udf("array<int>")
    def _probes(vecs: pd.Series) -> pd.Series:
        Q = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])  # (q, d)
        d2 = (Q * Q).sum(axis=1, keepdims=True) - 2.0 * (Q @ C.T) + c_sq
        order = np.argsort(d2, kind="stable", axis=1)[:, :nprobe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("_qvec"),
        F.explode(_probes(F.col(vec_col))).alias("centroid_id"),
    )
    cand = indexed_corpus.join(q, "centroid_id").filter(
        F.col(id_col) != F.col(query_id_col)
    )
    scored = cand.withColumn(
        "cosine", cosine_similarity_col(F.col("_qvec"), F.col(vec_col))
    )
    w = W.partitionBy(query_id_col).orderBy(
        F.desc(F.round("cosine", 6)), F.asc(id_col)
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(query_id_col, F.col(id_col).alias("match_id"),
                F.round("cosine", 6).alias("cosine"), F.col("_rn").alias("rank"))
    )
