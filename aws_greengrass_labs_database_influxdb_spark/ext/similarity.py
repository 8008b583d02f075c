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
- :func:`pq_train` / :func:`pq_encode` / :func:`pq_adc_topk` —
  product quantization: the corpus is stored as m one-byte centroid
  codes (~32× smaller than float32) and scanned via asymmetric
  distance lookups; the data-independent
  :func:`pq_codebook_random` variant is engine-portable, putting
  encode+ADC under an exact SQL oracle. :func:`ivf_pq_topk` composes
  IVF routing with the PQ scan.
- :func:`sq8_params` / :func:`sq8_encode` / :func:`sq8_topk` — 8-bit
  scalar quantization: per-dimension min/max ranges (exact order
  statistics), 4× compression, on-the-fly decode at scan time. Less
  compression than PQ but near-exact rankings and no training.

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


# ----------------------------------------------------- product quantization


def pq_codebook_random(
    m: int = 8, k: int = 16, sub_dim: int = 8, seed: int = 7
) -> list[list[list[float]]]:
    """Data-independent PQ codebook: ``m`` subspaces × ``k`` centroids
    × ``sub_dim`` components, seeded uniform [-1, 1] rounded to 6dp.

    6dp decimal literals parse to identical doubles in every engine,
    so a codebook embedded as literals in both the Spark plan and a
    SQL oracle makes the whole encode→ADC pipeline engine-portable
    (:func:`pq_encode` / :func:`pq_adc_topk` are exact given the same
    codebook). Production uses :func:`pq_train` instead — same encode
    machinery, learned centroids.
    """
    import random

    rng = random.Random(seed)
    return [
        [[round(rng.uniform(-1.0, 1.0), 6) for _ in range(sub_dim)] for _ in range(k)]
        for _ in range(m)
    ]


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample: int = 4096,
    seed: int = 7,
    max_iter: int = 25,
) -> list[list[list[float]]]:
    """Train a PQ codebook: per-subspace Lloyd's k-means over a
    bounded, deterministic sample.

    The sample (first ``sample`` ids — deterministic, bounded by
    construction) is the ONLY data that reaches the driver; encoding
    the full corpus stays distributed (:func:`pq_encode` is pure
    Column arithmetic). ``sample`` ≈ 4k vectors trains 16-256
    centroids fine regardless of corpus size — at 100 TB you still
    collect only kilobytes.
    """
    rows = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .orderBy(id_col)
        .limit(sample)
        .collect()
    )
    X = np.array([list(r[1]) for r in rows], dtype=np.float64)
    dims = X.shape[1]
    assert dims % m == 0, f"dims {dims} not divisible by m={m}"
    sub = dims // m
    rng = np.random.RandomState(seed)
    book = []
    for s in range(m):
        Xs = X[:, s * sub : (s + 1) * sub]
        C = Xs[rng.choice(len(Xs), size=k, replace=False)].copy()
        for _ in range(max_iter):
            d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            newC = np.array(
                [
                    Xs[assign == c].mean(axis=0) if (assign == c).any() else C[c]
                    for c in range(k)
                ]
            )
            if np.allclose(newC, C):
                break
            C = newC
        book.append([[float(v) for v in row] for row in C])
    return book


def _nested_double_expr(nested) -> Column:
    """A nested all-double array literal rendered as ONE ``F.expr``
    string, parsed JVM-side (r16). Building the same tree from
    ``F.lit``/``F.array`` Columns cost one py4j round trip per element
    — ~0.9 s of construction for a 1 k-element codebook vs ~3 ms for
    the string parse (measured, 290×). Elements render in exponent
    form (``%.17e``), which the SQL lexer types as DOUBLE and
    ``Double.parseDouble`` round-trips exactly — the resulting Literal
    is bit-identical to the F.lit tree (verified via struct-packed
    comparison)."""

    def render(x) -> str:
        if isinstance(x, (list, tuple)):
            return "array(" + ",".join(render(v) for v in x) + ")"
        return format(float(x), ".17e").upper()

    return F.expr(render(nested))


def _pq_codebook_col(codebook) -> Column:
    """The codebook as ONE nested array literal
    (``array<array<array<double>>>``) — Catalyst constant-folds it to a
    single Literal node, so plans stay small no matter how big m·k·sub
    gets (inlining each weight into its own arithmetic node made the
    encode plan ~7 MB and cost ~8 s of codegen per query)."""
    return _nested_double_expr(codebook)


def _pq_subdist(vec: Column, cent: Column, s: Column, sub: int) -> Column:
    """Squared L2 distance of subvector ``s`` of ``vec`` to centroid
    ``cent`` as a left-to-right fold: 0.0 + t₀ + t₁ + … ≡ t₀ + t₁ + …
    bit-for-bit, the association order the SQL oracle replays."""
    subv = F.slice(vec, s * sub + 1, sub)
    return F.aggregate(
        F.zip_with(
            subv,
            cent,
            lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def _pq_dists_for_subspace(vec: Column, cbc: Column, s: Column, sub: int) -> Column:
    """k-element distance array of subvector ``s`` to every centroid."""
    return F.transform(
        F.element_at(cbc, s + 1), lambda cent: _pq_subdist(vec, cent, s, sub)
    )


def _pq_lut(vec: Column, codebook) -> Column:
    """Per-query ADC lookup table: m×k partial distances."""
    m = len(codebook)
    sub = len(codebook[0][0])
    cbc = _pq_codebook_col(codebook)
    return F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: _pq_dists_for_subspace(vec, cbc, s, sub),
    )


def pq_encode(
    df: DataFrame,
    codebook,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "expr",
    extra_cols: tuple = (),
) -> DataFrame:
    """Encode vectors to PQ codes: ``(id, codes array<int> of length
    m)`` — m bytes of payload per vector instead of dims floats.

    ``method="expr"`` (default) is pure Column arithmetic (no Python,
    no shuffle): per subspace a k-element distance array,
    ``array_position(array_min)`` picks the first-minimum centroid —
    the tie rule ``list_position(list_min)`` reproduces in SQL, which
    is what makes the operator oracle-checkable. The expression tree
    grows with m·k·sub_dim, so for large codebooks (k ≥ 64) use
    ``method="pandas"``: one Arrow-batched UDF doing the same argmin
    as a numpy matrix op (identical codes on real data; ties at
    float-ulp distance are the only theoretical divergence). Either
    way this is a map-only stage — the 100 TB win: the encoded corpus
    is ~32× smaller than float32 embeddings, and every downstream ADC
    scan touches only codes.
    """
    m = len(codebook)
    kk = len(codebook[0])
    if method == "pandas":
        from pyspark.sql.functions import pandas_udf

        CB = [np.asarray(codebook[s], dtype=np.float64) for s in range(m)]
        sub = CB[0].shape[1]

        @pandas_udf("array<int>")
        def _codes(vecs: pd.Series) -> pd.Series:
            X = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
            out = np.empty((len(X), m), dtype=np.int32)
            for s in range(m):
                Xs = X[:, s * sub : (s + 1) * sub]
                d2 = (
                    (Xs * Xs).sum(axis=1, keepdims=True)
                    - 2.0 * (Xs @ CB[s].T)
                    + (CB[s] * CB[s]).sum(axis=1)
                )
                out[:, s] = d2.argmin(axis=1)
            return pd.Series([row.tolist() for row in out])

        return df.select(
            F.col(id_col), *extra_cols, _codes(F.col(vec_col)).alias("codes")
        )
    if method != "expr":
        raise ValueError(f"unknown method {method!r}")
    del kk
    vec = F.col(vec_col)
    # materialize the m distance arrays once, then argmin each — the
    # per-subspace distances are not re-evaluated for the min
    codes = F.transform(
        _pq_lut(vec, codebook),
        lambda d: (F.array_position(d, F.array_min(d)) - 1).cast("int"),
    )
    return df.select(F.col(id_col), *extra_cols, codes.alias("codes"))


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebook,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    encode_method: str = "pandas",
) -> DataFrame:
    """Approximate L2 top-k by asymmetric distance computation (ADC):
    queries keep full precision, the corpus is scanned as PQ codes.

    Each query precomputes an m×k lookup table of partial distances to
    every centroid (Column arithmetic on the small broadcast side);
    the scan then sums m table lookups per corpus row — no float
    vector is read at all. At 100 TB: encode runs once at ingest and
    the persisted codes column is what every query scans — the inline
    encode here defaults to the Arrow path for that reason (its codes
    are asserted identical to the expression path's in unit tests and
    by the SQL oracle on the suite row). Corpus side = one map over
    the m-byte codes, one broadcast, one per-query top-k window.
    """
    m = len(codebook)
    enc = pq_encode(corpus, codebook, id_col, vec_col, method=encode_method)
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        _pq_lut(F.col(vec_col), codebook).alias("_lut"),
    )
    pairs = enc.crossJoin(F.broadcast(q)).filter(
        F.col(id_col) != F.col(query_id_col)
    )
    adc = None
    for s in range(m):
        t = F.element_at(F.element_at("_lut", s + 1), F.col("codes")[s] + 1)
        adc = t if adc is None else adc + t
    scored = pairs.withColumn("adc", F.round(adc, 6))
    w = W.partitionBy(query_id_col).orderBy(F.asc("adc"), F.asc(id_col))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(query_id_col, F.col(id_col).alias("match_id"), "adc",
                F.col("_rn").cast("int").alias("rank"))
    )


def ivf_pq_topk(
    indexed_corpus: DataFrame,
    centroids: list[list[float]],
    queries: DataFrame,
    codebook,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    encode_method: str = "pandas",
) -> DataFrame:
    """IVF-PQ: the production ANN composition — coarse cells bound
    WHICH rows are scanned (IVF routing), PQ codes bound HOW MUCH is
    read per row (m bytes + m table lookups).

    The candidate join is keyed on ``centroid_id`` and carries only
    PQ codes; queries broadcast their probe list and m×k ADC table.
    At 100 TB: persist the encoded corpus bucketed by ``centroid_id``
    and a query reads ~(nprobe/n_centroids) · m/dims/4 of the raw
    scan bytes. With ``nprobe == n_centroids`` every cell is probed
    and the result is exactly :func:`pq_adc_topk` (the unit-test and
    oracle invariant, mirroring IVF's full-probe ≡ brute force).
    """
    from pyspark.sql.functions import pandas_udf

    m = len(codebook)
    C = np.asarray(centroids, dtype=np.float64)
    nprobe = min(nprobe, len(centroids))
    c_sq = (C * C).sum(axis=1)

    @pandas_udf("array<int>")
    def _probes(vecs: pd.Series) -> pd.Series:
        Q = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        d2 = (Q * Q).sum(axis=1, keepdims=True) - 2.0 * (Q @ C.T) + c_sq
        order = np.argsort(d2, kind="stable", axis=1)[:, :nprobe]
        return pd.Series([row.astype("int32").tolist() for row in order])

    enc = pq_encode(
        indexed_corpus, codebook, id_col, vec_col,
        method=encode_method, extra_cols=("centroid_id",),
    )
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        _pq_lut(F.col(vec_col), codebook).alias("_lut"),
        F.explode(_probes(F.col(vec_col))).alias("centroid_id"),
    )
    cand = enc.join(F.broadcast(q), "centroid_id").filter(
        F.col(id_col) != F.col(query_id_col)
    )
    adc = None
    for s in range(m):
        t = F.element_at(F.element_at("_lut", s + 1), F.col("codes")[s] + 1)
        adc = t if adc is None else adc + t
    scored = cand.withColumn("adc", F.round(adc, 6))
    w = W.partitionBy(query_id_col).orderBy(F.asc("adc"), F.asc(id_col))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(query_id_col, F.col(id_col).alias("match_id"), "adc",
                F.col("_rn").cast("int").alias("rank"))
    )


# ----------------------------------------------------- scalar quantization


def sq8_params(
    corpus: DataFrame, vec_col: str = "embedding", dims: int = 64
) -> DataFrame:
    """Per-dimension [min, max] ranges for 8-bit scalar quantization —
    ONE row with two ``array<double>`` columns, produced by 2·dims
    min/max aggregates (map-side combining, one reduce).

    Order statistics, not sums: exact at any parallelism, which is what
    makes the whole SQ8 pipeline oracle-checkable. The row stays
    in-plan (broadcast into encode/search) — nothing is collected.

    Shape: posexplode → groupBy(dim) partial-aggregates, then one
    64-struct collect_list back into the arrays. The explode is
    pipelined into per-partition partial min/max (64 rows of state, no
    materialized dims× expansion), and it replaces a 2·dims-expression
    generated aggregate whose codegen alone dominated the runtime
    (measured 3.5 s → 0.45 s at sf0.1).
    """
    mm = (
        corpus.select(F.posexplode(F.col(vec_col)).alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.min(F.col("x").cast("double")).alias("mn"),
            F.max(F.col("x").cast("double")).alias("mx"),
        )
    )
    return mm.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mn"))), lambda s: s["mn"]
        ).alias("mins"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mx"))), lambda s: s["mx"]
        ).alias("maxs"),
    )


def sq8_encode(
    corpus: DataFrame,
    params: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
) -> DataFrame:
    """8-bit scalar-quantize each vector: ``code_d = ⌊(x_d − mn_d) /
    (mx_d − mn_d) · 255⌋`` clamped to [0, 255] (degenerate dims → 0).

    4× smaller than float32 (dims bytes per vector), map-only, pure
    Column arithmetic — the codes column is what you persist; at scan
    time values decode on the fly from the broadcast ranges.
    """
    vec = F.col(vec_col)
    j = corpus.crossJoin(F.broadcast(params))
    codes = F.transform(
        F.sequence(F.lit(0), F.lit(dims - 1)),
        lambda d: F.when(
            F.element_at("maxs", d + 1) == F.element_at("mins", d + 1), F.lit(0)
        )
        .otherwise(
            F.least(
                F.greatest(
                    F.floor(
                        (F.element_at(vec, d + 1).cast("double")
                         - F.element_at("mins", d + 1))
                        / (F.element_at("maxs", d + 1) - F.element_at("mins", d + 1))
                        * F.lit(255)
                    ),
                    F.lit(0),
                ),
                F.lit(255),
            )
        )
        .cast("int"),
    )
    return j.select(F.col(id_col), "mins", "maxs", codes.alias("codes"))


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dims: int = 64,
) -> DataFrame:
    """Approximate L2 top-k over SQ8 codes: the corpus is scanned as
    dims one-byte codes decoded on the fly against the broadcast
    ranges (``v̂_d = mn_d + code_d · (mx_d − mn_d)/255``); queries keep
    full precision. Distances are strict left-to-right folds → exact
    SQL reproduction. Complements PQ: SQ8 trades less compression
    (4× vs 32×) for lower distortion and no codebook training.
    """
    params = sq8_params(corpus, vec_col, dims)
    enc = sq8_encode(corpus, params, id_col, vec_col, dims)
    q = queries.select(
        F.col(id_col).alias(query_id_col), F.col(vec_col).alias("_qv")
    )
    pairs = enc.crossJoin(F.broadcast(q)).filter(
        F.col(id_col) != F.col(query_id_col)
    )

    def term(d):
        vhat = F.element_at("mins", d + 1) + F.element_at("codes", d + 1) * (
            (F.element_at("maxs", d + 1) - F.element_at("mins", d + 1)) / F.lit(255.0)
        )
        x = F.element_at("_qv", d + 1).cast("double") - vhat
        return x * x

    dist = F.aggregate(
        F.sequence(F.lit(0), F.lit(dims - 1)),
        F.lit(0.0),
        lambda acc, d: acc + term(d),
    )
    scored = pairs.withColumn("dist", F.round(dist, 6))
    w = W.partitionBy(query_id_col).orderBy(F.asc("dist"), F.asc(id_col))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(query_id_col, F.col(id_col).alias("match_id"), "dist",
                F.col("_rn").cast("int").alias("rank"))
    )


# ------------------------------------------------- balanced subsampling


def cluster_balanced_sample(
    corpus: DataFrame,
    centroids: list[list[float]],
    per_cluster: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Diversity-balanced corpus subsample: vector-quantize each row to
    its nearest centroid, then keep a deterministic quota per cluster
    — the curation step that stops a training mix from being dominated
    by its densest embedding regions.

    Returns ``(id, cluster, samp_rank)`` for the kept rows. The
    within-cluster order is ``md5(id)`` (a seedless deterministic
    shuffle — stable across runs and engines, unlike rand()), so the
    sample is reproducible and oracle-checkable. One map stage for
    assignment (literal centroid arrays, same HOF distance folds as
    PQ) + one per-cluster window; the corpus shuffles once, on the
    cluster key. Centroids come from :func:`ivf_build` (trained) or
    :func:`pq_codebook_random`-style literals (portable/oracle mode).
    """
    dists = F.element_at(_pq_lut(F.col(vec_col), [centroids]), 1)
    cluster = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    assigned = corpus.select(F.col(id_col), cluster.alias("cluster"))
    w = W.partitionBy("cluster").orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        assigned.withColumn("samp_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("samp_rank") <= per_cluster)
        .select(id_col, "cluster", "samp_rank")
    )


def knn_graph(
    corpus: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    nprobe: int | None = None,
    max_iter: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """k-nearest-neighbor graph over the corpus itself: ``(src_id,
    match_id, cosine, rank)`` — every vector's top-k cosine neighbors.

    The building block for diversity sampling, graph-based clustering,
    and semantic-dedup audits. Routed through the IVF index so the
    self-"join" is keyed on ``centroid_id`` — candidates are bounded by
    (cell size × nprobe), never the N² all-pairs frame; cell skew is
    the one hot axis (AQE skew-join splits hot cells). With
    ``nprobe=None`` (= all cells) the graph is exact — the oracle
    configuration; production uses ``nprobe ≪ n_centroids``.
    """
    indexed, centroids = ivf_build(
        corpus, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col,
        seed=seed, max_iter=max_iter,
    )
    return ivf_topk(
        indexed, centroids, corpus.select(id_col, vec_col),
        k=k, nprobe=n_centroids if nprobe is None else nprobe,
        id_col=id_col, vec_col=vec_col, query_id_col="src_id",
    )


def ivf_pq_residual_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    codebook,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    encode_method: str = "expr",
) -> DataFrame:
    """IVF-PQ with residual encoding — the classic IVFPQ formulation:
    each vector is PQ-encoded as its residual ``x − c(cell)`` and each
    query builds a separate ADC table per probed cell over
    ``q − c(cell)``. Residuals have smaller norms than raw vectors, so
    the same codebook budget quantizes them with less distortion.

    Everything is Column arithmetic (no Python anywhere): cell
    assignment is an argmin over the literal centroid array, the probe
    list is a sorted (distance, index) struct slice, the per-cell
    query LUT is the standard m×k table over the residual. With
    literal (portable) centroids the ENTIRE pipeline — including the
    PARTIAL-probe candidate routing — replays exactly in SQL, which is
    a stronger oracle than the full-probe-only gates of the
    non-residual variants.

    100 TB shape: identical to :func:`ivf_pq_topk` — encoded corpus
    persisted bucketed by ``centroid_id`` (m bytes payload per row),
    candidate join keyed on the cell, broadcast query side carrying
    nprobe LUTs per query.
    """
    C = len(centroids)
    m = len(codebook)
    nprobe = min(nprobe, C)
    cent_col = _nested_double_expr([[float(v) for v in c] for c in centroids])

    def cell_dists(vec):
        return F.element_at(_pq_lut(vec, [centroids]), 1)

    vd = cell_dists(F.col(vec_col))
    cell = (F.array_position(vd, F.array_min(vd)) - 1).cast("int")
    assigned = corpus.select(
        F.col(id_col), F.col(vec_col), cell.alias("centroid_id")
    )
    res = F.zip_with(
        F.col(vec_col),
        F.element_at(cent_col, F.col("centroid_id") + 1),
        lambda x, c: x.cast("double") - c,
    )
    enc = pq_encode(
        assigned.withColumn("_res", res), codebook, id_col, "_res",
        method=encode_method, extra_cols=("centroid_id",),
    )

    qd = cell_dists(F.col(vec_col))
    probe_structs = F.array_sort(
        F.zip_with(
            qd,
            F.sequence(F.lit(0), F.lit(C - 1)),
            lambda d, i: F.struct(d.alias("d"), i.alias("i")),
        )
    )
    probes = F.slice(F.transform(probe_structs, lambda s: s["i"]), 1, nprobe)
    q = queries.select(
        F.col(id_col).alias(query_id_col),
        F.col(vec_col).alias("_qv"),
        F.explode(probes).alias("centroid_id"),
    )
    qres = F.zip_with(
        F.col("_qv"),
        F.element_at(cent_col, F.col("centroid_id") + 1),
        lambda x, c: x.cast("double") - c,
    )
    q = q.select(
        query_id_col, "centroid_id", _pq_lut(qres, codebook).alias("_lut")
    )
    cand = enc.join(F.broadcast(q), "centroid_id").filter(
        F.col(id_col) != F.col(query_id_col)
    )
    adc = None
    for s in range(m):
        t = F.element_at(F.element_at("_lut", s + 1), F.col("codes")[s] + 1)
        adc = t if adc is None else adc + t
    scored = cand.withColumn("adc", F.round(adc, 6))
    w = W.partitionBy(query_id_col).orderBy(F.asc("adc"), F.asc(id_col))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(query_id_col, F.col(id_col).alias("match_id"), "adc",
                F.col("_rn").cast("int").alias("rank"))
    )


def random_projection(
    df: DataFrame,
    k: int = 16,
    dims: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: compress ``dims``-d
    embeddings to ``k`` dimensions with a deterministic ±1/√k sign
    matrix (Achlioptas 2003, public method) — the cheap first stage
    before ANN indexing or clustering when the raw vectors are too
    wide to shuffle.

    Output: one row per ``(id_col, dim, rp)`` — ``dim`` ∈ [0, k),
    ``rp`` the projected coordinate.

    Determinism / oracle: sign(i, j) = +1 iff the first hex digit of
    md5("i:j:seed") is even — reproducible in any SQL engine. Each
    per-dimension sum is a left-to-right DOUBLE fold over a fixed
    index order (seeded with +0.0 on both engines), so every product
    and add is the same IEEE-754 operation in the same association —
    bit-exact without quantization (the LSH/PQ fold precedent; the
    first cut used decimal-quantized terms, ~2.4x slower for the
    same answers at BigDecimal speed).

    Scale shape: map-only. The sign matrix is a plan literal
    (``dims``×``k`` doubles — kilobytes); projection is ``k`` in-row
    ``aggregate`` folds over the vector; no shuffle, no UDF, no
    driver state — fuses into the scan at any corpus size.

    r15: the ``k`` folds are generated by ONE ``transform`` lambda over
    the output dimensions instead of ``k`` separate Column expressions.
    With per-dimension expressions, project-collapse inlined the
    ``dims``×``k`` matrix literal into every fold — 16 copies of a
    1024-element nested array in the plan (104 KB formatted; measured
    ~1 s of analysis/codegen per bench construction, 3× the query's
    execution time). One lambda = one literal copy (12 KB plan); the
    per-element IEEE operation sequence is unchanged, so results stay
    bit-identical to the oracle (verified cell-exact at sf0.1).
    """
    import hashlib
    import math

    scale = 1.0 / math.sqrt(k)

    def _sign(i: int, j: int) -> float:
        h = hashlib.md5(f"{i}:{j}:{seed}".encode()).hexdigest()[0]
        return scale if h in "02468ace" else -scale

    # ONE nested-array literal (the PQ codebook lesson: per-weight
    # scattered literals bloat the plan; a single CreateArray doesn't),
    # rendered as one JVM-parsed expr string (r16): the 1024
    # F.lit/F.array py4j calls were ~0.6 s of the query's construction
    mat = _nested_double_expr(
        [[_sign(i, j) for j in range(k)] for i in range(dims)]
    )
    vec = F.col(vec_col)

    rps = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda j: F.aggregate(
            F.sequence(F.lit(0), F.lit(dims - 1)),
            F.lit(0.0),
            lambda acc, i: acc
            + F.element_at(vec, i + 1).cast("double")
            * F.element_at(F.element_at(F.col("_rpm"), i + 1), j + 1),
        ),
    )
    return (
        df.withColumn("_rpm", mat)
        .select(id_col, F.posexplode(rps).alias("dim", "rp"))
    )
