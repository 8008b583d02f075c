"""Product quantization (ext/similarity.py PQ family): encode path
equivalence, trained-codebook recall vs exact search, and the
determinism contracts the SQL oracle relies on."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from aws_greengrass_labs_database_influxdb_spark.ext.similarity import (
    pq_adc_topk,
    pq_codebook_random,
    pq_encode,
    pq_train,
)
from aws_greengrass_labs_database_influxdb_spark.sources.io import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_codebook_random_is_deterministic():
    a = pq_codebook_random(m=8, k=16, sub_dim=8)
    b = pq_codebook_random(m=8, k=16, sub_dim=8)
    assert a == b
    assert len(a) == 8 and len(a[0]) == 16 and len(a[0][0]) == 8
    assert all(-1.0 <= v <= 1.0 for sub in a for cent in sub for v in cent)


def test_expr_and_pandas_encode_agree(emb):
    cb = pq_codebook_random()
    by_expr = {r.vec_id: r.codes for r in pq_encode(emb, cb, method="expr").collect()}
    by_pd = {r.vec_id: r.codes for r in pq_encode(emb, cb, method="pandas").collect()}
    assert by_expr == by_pd
    # codes are within the codebook range
    assert all(0 <= c < 16 for codes in by_expr.values() for c in codes)


def test_trained_codebook_has_lower_distortion_than_random(spark, emb):
    rows = emb.orderBy("vec_id").limit(300).collect()
    X = np.array([list(r.embedding) for r in rows], dtype=np.float64)

    def distortion(cb):
        total = 0.0
        for s in range(8):
            C = np.asarray(cb[s])
            Xs = X[:, s * 8 : (s + 1) * 8]
            d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            total += d2.min(axis=1).mean()
        return total

    trained = pq_train(emb, m=8, k=16, sample=300)
    assert distortion(trained) < 0.5 * distortion(pq_codebook_random())


def test_adc_topk_recall_vs_exact_l2(emb):
    """Trained PQ ranking must far exceed chance against exact L2.

    The synthetic embeddings are near-uniform (neighbors separated by
    tiny margins), so absolute recall is data-limited — the meaningful
    invariant is the gap over random selection: random top-20 of ~500
    would contain 5·(20/500) ≈ 0.2 of each exact top-5 (≈1/25 hits);
    measured PQ containment is ≈11/25. Assert ≥8/25 (comfortably
    above noise, below measured)."""
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([list(r.embedding) for r in rows], dtype=np.float64)

    cb = pq_train(emb, m=8, k=16)
    approx = pq_adc_topk(emb, emb.filter(F.col("vec_id") < 5), cb, k=20)
    got = {}
    for r in approx.collect():
        got.setdefault(r.query_id, set()).add(r.match_id)

    hits = total = 0
    for qi in range(5):
        q = X[ids == qi][0]
        d2 = ((X - q) ** 2).sum(axis=1)
        d2[ids == qi] = np.inf
        exact5 = set(ids[np.argsort(d2, kind="stable")[:5]].tolist())
        hits += len(exact5 & got[qi])
        total += 5
    assert total == 25
    assert hits / total >= 0.32, f"PQ containment too low: {hits}/{total}"


def test_adc_output_shape_and_ranks(emb):
    out = pq_adc_topk(emb, emb.filter(F.col("vec_id") < 3), pq_codebook_random(), k=4)
    rows = out.collect()
    assert len(rows) == 12
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        assert sorted(r.rank for r in rs) == [1, 2, 3, 4]
        ordered = sorted(rs, key=lambda r: r.rank)
        assert all(
            ordered[i].adc <= ordered[i + 1].adc for i in range(len(ordered) - 1)
        )
        assert all(r.match_id != q for r in rs)


def test_ivf_pq_full_probe_equals_pq_adc(emb):
    from aws_greengrass_labs_database_influxdb_spark.ext.similarity import (
        ivf_build,
        ivf_pq_topk,
    )

    cb = pq_codebook_random()
    indexed, centroids = ivf_build(emb, n_centroids=8, max_iter=4)
    q = emb.filter(F.col("vec_id") < 3)
    full = ivf_pq_topk(indexed, centroids, q, cb, k=5, nprobe=8)
    plain = pq_adc_topk(emb, q, cb, k=5)
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, plain.collect()))


def test_ivf_pq_partial_probe_subsets_probed_cells(emb):
    from aws_greengrass_labs_database_influxdb_spark.ext.similarity import (
        ivf_build,
        ivf_pq_topk,
    )

    cb = pq_codebook_random()
    indexed, centroids = ivf_build(emb, n_centroids=8, max_iter=4)
    q = emb.filter(F.col("vec_id") < 3)
    part = ivf_pq_topk(indexed, centroids, q, cb, k=5, nprobe=2)
    rows = part.collect()
    # every query still gets k results, drawn only from probed cells
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2}
    cell_of = {r.vec_id: r.centroid_id for r in indexed.select("vec_id", "centroid_id").collect()}
    for qi, rs in by_q.items():
        assert sorted(r.rank for r in rs) == [1, 2, 3, 4, 5]
        # matches live in at most nprobe distinct cells
        assert len({cell_of[r.match_id] for r in rs}) <= 2


def test_sq8_topk_nearly_exact(emb):
    """255 levels per dimension quantize finely — SQ8 top-5 should
    almost exactly match exact L2 top-5 (unlike PQ's coarse cells)."""
    from aws_greengrass_labs_database_influxdb_spark.ext.similarity import sq8_topk

    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    out = sq8_topk(emb, emb.filter(F.col("vec_id") < 5), k=5)
    got = {}
    for r in out.collect():
        got.setdefault(r.query_id, set()).add(r.match_id)
    hits = 0
    for qi in range(5):
        qv = X[ids == qi][0]
        d2 = ((X - qv) ** 2).sum(axis=1)
        d2[ids == qi] = np.inf
        exact5 = set(ids[np.argsort(d2, kind="stable")[:5]].tolist())
        hits += len(exact5 & got[qi])
    assert hits >= 20, f"SQ8 recall@5 unexpectedly low: {hits}/25"


def test_sq8_encode_bounds_and_degenerate_dims(spark):
    from aws_greengrass_labs_database_influxdb_spark.ext.similarity import (
        sq8_encode,
        sq8_params,
    )

    rows = [(0, [0.0, 5.0, -1.0, 7.0]), (1, [1.0, 5.0, 3.0, 7.0]),
            (2, [0.5, 5.0, 1.0, 7.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    p = sq8_params(df, dims=4)
    enc = {r.vec_id: r.codes for r in sq8_encode(df, p, dims=4).collect()}
    # min → 0, max → 255; constant dims (1 and 3) → 0 everywhere
    assert enc[0] == [0, 0, 0, 0]
    assert enc[1] == [255, 0, 255, 0]
    assert all(0 <= c <= 255 for codes in enc.values() for c in codes)


def test_cluster_balanced_sample_quota_and_determinism(emb):
    from aws_greengrass_labs_database_influxdb_spark.ext.similarity import (
        cluster_balanced_sample,
        ivf_build,
        pq_codebook_random,
    )

    cents = pq_codebook_random(m=1, k=16, sub_dim=64, seed=11)[0]
    a = cluster_balanced_sample(emb, cents, per_cluster=5).collect()
    b = cluster_balanced_sample(emb, cents, per_cluster=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    per = {}
    for r in a:
        per[r.cluster] = per.get(r.cluster, 0) + 1
        assert 1 <= r.samp_rank <= 5
    assert all(v <= 5 for v in per.values())
    assert len(per) > 1  # random centroids split the corpus

    # trained-centroid path: k-means cells give a balanced-ish split
    _, trained = ivf_build(emb, n_centroids=8, max_iter=4)
    t = cluster_balanced_sample(emb, trained, per_cluster=5).collect()
    clusters = {r.cluster for r in t}
    assert clusters <= set(range(8)) and len(clusters) >= 4
    assert all(r.samp_rank <= 5 for r in t)


def test_residual_ivfpq_matches_plain_adc_at_full_probe_on_zero_centroids(spark, sf_dir):
    """With all-zero centroids every residual IS the raw vector, so
    residual IVF-PQ at full probe must equal plain PQ-ADC exactly —
    the composition gate for the residual path."""
    from aws_greengrass_labs_database_influxdb_spark.ext.similarity import (
        ivf_pq_residual_topk,
        pq_adc_topk,
        pq_codebook_random,
        pq_encode,
    )
    from aws_greengrass_labs_database_influxdb_spark.sources.io import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "embeddings")
    cb = pq_codebook_random(m=8, k=16, sub_dim=8)
    zero_cents = [[0.0] * 64]  # one cell at the origin
    got = {
        (r.query_id, r.match_id, r.adc, r.rank)
        for r in ivf_pq_residual_topk(
            e, e.filter(F.col("vec_id") < 3), zero_cents, cb, k=4, nprobe=1
        ).collect()
    }
    plain = {
        (r.query_id, r.match_id, r.adc, r.rank)
        for r in pq_adc_topk(
            e, e.filter(F.col("vec_id") < 3), cb, k=4
        ).collect()
    }
    assert got == plain


def test_residual_encoding_reduces_trained_distortion(spark, sf_dir):
    """Residuals have smaller norms than raw vectors, so a codebook of
    the same budget trained on residuals reconstructs with lower (or
    equal) mean squared error — the reason IVFPQ encodes residuals."""
    import numpy as np

    from aws_greengrass_labs_database_influxdb_spark.ext.similarity import (
        ivf_build,
        pq_train,
    )
    from aws_greengrass_labs_database_influxdb_spark.sources.io import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "embeddings")
    indexed, cents = ivf_build(e, n_centroids=8, max_iter=4)
    C = np.asarray(cents)
    res = indexed.select(
        F.col("vec_id"),
        F.zip_with(
            "embedding",
            F.element_at(
                F.array(*[F.array(*[F.lit(float(v)) for v in c]) for c in cents]),
                F.col("centroid_id") + 1,
            ),
            lambda x, c: x.cast("double") - c,
        ).alias("embedding"),
    )

    def mse(frame, codebook):
        rows = frame.select("embedding").collect()
        X = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
        err = 0.0
        for s in range(8):
            Xs = X[:, s * 8 : (s + 1) * 8]
            CB = np.asarray(codebook[s])
            d2 = ((Xs[:, None, :] - CB[None, :, :]) ** 2).sum(axis=2)
            err += d2.min(axis=1).sum()
        return err / len(X)

    cb_raw = pq_train(e, m=8, k=16)
    cb_res = pq_train(res, m=8, k=16)
    m_raw = mse(e.select("embedding"), cb_raw)
    m_res = mse(res, cb_res)
    assert m_res <= m_raw * 1.02, (m_res, m_raw)
