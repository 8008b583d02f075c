"""Training-data extension tests: approximate methods vs their exact
baselines (recall), and multimodal plumbing."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from aws_greengrass_labs_database_influxdb_spark.ext import (
    brute_force_topk,
    embedding_near_dup_pairs,
    exact_dedup,
    lsh_bucket_topk,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from aws_greengrass_labs_database_influxdb_spark.ext.multimodal import (
    extract_features,
    fake_decode,
    real_decode_unavailable,
    sample_frames,
    MEDIA_SCHEMA,
)


@pytest.fixture(scope="module")
def docs(spark):
    """Documents with planted near-duplicates."""
    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm windowsill and the birds sing in the garden trees"
    )
    rows = [(0, base), (1, base), (2, base.replace("cat", "hamster")),
            (3, "completely different content about spark query engines and "
                "distributed columnar execution with whole stage codegen"),
            (4, base.replace("dog", "wolf").replace("garden", "city"))]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(docs):
    out = exact_dedup(docs).collect()
    groups = {r.text_hash: (r.n_dups, r.keep_doc_id) for r in out}
    assert max(n for n, _ in groups.values()) == 2  # docs 0 and 1 identical
    dup = [v for v in groups.values() if v[0] == 2][0]
    assert dup[1] == 0  # keeper = min doc_id


def test_ngram_skew_guard_prunes_stop_shingles(spark):
    """A stop-shingle shared by every doc must not create O(N²)
    candidates: with the guard on (default), docs whose only overlap is
    the hot shingle produce no pair; genuinely similar docs still do."""
    hot = "lorem ipsum dolor"  # one 3-gram shared by ALL docs
    rows = [(i, f"{hot} unique{i} filler{i} words{i} here{i}") for i in range(40)]
    rows += [(100, f"{hot} shared tail of nearly identical text"),
             (101, f"{hot} shared tail of nearly identical text")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = ngram_jaccard_pairs(df, n=3, threshold=0.1, max_shingle_freq=10)
    pairs = {(r.a, r.b) for r in out.collect()}
    assert (100, 101) in pairs
    # no pair among the 40 hot-only docs (C(40,2)=780 would explode)
    assert all(a == 100 for a, _ in pairs), pairs


def test_minhash_lsh_finds_what_exact_jaccard_finds(docs):
    exact = {
        (r.a, r.b): r.jaccard
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.5).collect()
    }
    cand = {(r.a, r.b): r.est_jaccard for r in minhash_lsh_pairs(docs, n=3).collect()}
    # every high-jaccard pair must be recalled by the band join
    for pair, j in exact.items():
        if j >= 0.8:
            assert pair in cand, f"LSH missed near-dup pair {pair} (jaccard={j})"
    # and its estimate should be in the right ballpark
    assert cand[(0, 1)] == 1.0  # identical docs → identical signatures


def test_simhash_near_pairs_catch_near_dups(docs):
    pairs = {(r.a, r.b): r.hamming for r in simhash_near_pairs(docs, max_hamming=10).collect()}
    assert pairs.get((0, 1)) == 0  # identical text → identical simhash
    assert (0, 3) not in pairs  # unrelated doc stays out


def test_lsh_topk_recall_against_brute_force(spark, sf_dir):
    from aws_greengrass_labs_database_influxdb_spark.sources.io import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3)
    exact = brute_force_topk(e, q, k=5)
    approx = lsh_bucket_topk(e, q, k=5, n_tables=8, planes=6)
    exact_pairs = {(r.query_id, r.match_id) for r in exact.collect()}
    approx_pairs = {(r.query_id, r.match_id) for r in approx.collect()}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.2, f"LSH recall collapsed: {recall}"


def test_embedding_near_dup_exact_vs_lsh_subset(spark, sf_dir):
    from aws_greengrass_labs_database_influxdb_spark.sources.io import load_table

    e = load_table(spark, sf_dir, "embeddings").limit(200)
    exact = {(r.a, r.b) for r in embedding_near_dup_pairs(e, 0.4, exact=True).collect()}
    lsh = {(r.a, r.b) for r in embedding_near_dup_pairs(e, 0.4, exact=False).collect()}
    assert lsh.issubset(exact)  # LSH may miss, but never invents pairs


# ------------------------------------------------------------- multimodal

def test_multimodal_extract_features_plumbing(spark):
    rows = [
        (1, "image", b"\x89PNG...fakebytes", ("image/png", 64, 64, None)),
        (2, "audio", b"RIFF....fakewav", ("audio/wav", None, None, 1500)),
        (3, "image", None, ("image/png", 8, 8, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_features(media).collect()
    by_id = {r.media_id: r for r in feats}
    assert len(by_id[1].feature) == 8  # deterministic fake 8-dim feature
    assert by_id[1].n_bytes == len(b"\x89PNG...fakebytes")
    assert by_id[3].feature == []  # null content → empty, batch survives
    # determinism: same bytes → same features
    assert extract_features(media).collect()[0].feature == feats[0].feature


def test_multimodal_real_decode_is_marked_unavailable():
    with pytest.raises(NotImplementedError):
        real_decode_unavailable(b"bytes", "image")


def test_video_frame_sampling_grid(spark):
    rows = [(7, "video", b"fakevideo", ("video/mp4", 640, 480, 3500))]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    frames = sample_frames(media, every_ms=1000).collect()
    assert [r.frame_ms for r in frames] == [0, 1000, 2000, 3000]


# -------------------------------------------------------------------- IVF

def test_ivf_full_probe_equals_brute_force(spark, sf_dir):
    """nprobe == n_centroids probes every cell → exactly brute force
    (every corpus vector sits in exactly one probed cell)."""
    from aws_greengrass_labs_database_influxdb_spark.sources.io import load_table
    from aws_greengrass_labs_database_influxdb_spark.ext.similarity import ivf_build, ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3)
    indexed, centroids = ivf_build(e, n_centroids=8)
    full = ivf_topk(indexed, centroids, q, k=5, nprobe=8).collect()
    exact = brute_force_topk(e, q, k=5).collect()
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    assert {key(r): r.match_id for r in full} == {key(r): r.match_id for r in exact}


def test_ivf_partial_probe_recall(spark, sf_dir):
    from aws_greengrass_labs_database_influxdb_spark.sources.io import load_table
    from aws_greengrass_labs_database_influxdb_spark.ext.similarity import ivf_build, ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    indexed, centroids = ivf_build(e, n_centroids=8)
    approx = ivf_topk(indexed, centroids, q, k=5, nprobe=3)
    exact = brute_force_topk(e, q, k=5)
    exact_pairs = {(r.query_id, r.match_id) for r in exact.collect()}
    approx_pairs = {(r.query_id, r.match_id) for r in approx.collect()}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.5, f"IVF nprobe=3/8 recall collapsed: {recall}"
    # a probed-cell result never invents a neighbor that brute force
    # wouldn't score identically
    for r in approx.collect():
        assert r.cosine <= 1.0 + 1e-9
