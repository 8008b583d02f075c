"""BPE vocabulary induction (ext/bpe.py) vs a literal reference
implementation of the canonical greedy merge procedure."""

from __future__ import annotations

from collections import Counter

from aws_greengrass_labs_database_influxdb_spark.ext.bpe import bpe_apply, bpe_train

TEXTS = [
    "the cat sat on the mat",
    "the bat and the cat",
    "thematic the them theme",
    "aaaaa aa a",
    "banana bandana band",
]


def _ref_bpe(texts, k):
    wc = Counter()
    for t in texts:
        for w in " ".join(t.lower().split()).split(" "):
            if w:
                wc[w] += 1
    words = {w: list(w) for w in wc}
    merges = []
    for _ in range(k):
        pc = Counter()
        for w, sym in words.items():
            for a, b in zip(sym, sym[1:]):
                pc[(a, b)] += wc[w]
        if not pc:
            break
        m = max(pc.values())
        best = sorted(p for p, c in pc.items() if c == m)[0]
        merges.append((best[0], best[1], m))
        a, b = best
        for w, sym in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[w] = out
    return merges, words


def test_bpe_train_matches_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    ref_merges, _ = _ref_bpe(TEXTS, 8)
    merges, mdf = bpe_train(df, n_merges=8)
    assert merges == ref_merges  # incl. run pairing (aa)(aa)a + tie rule
    rows = sorted(mdf.collect(), key=lambda r: r.step)
    assert [(r.left, r.right, r.pair_count) for r in rows] == ref_merges
    assert rows[0].merged == rows[0].left + rows[0].right


def test_bpe_apply_matches_reference_segmentation(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    ref_merges, ref_words = _ref_bpe(TEXTS, 8)
    merges, _ = bpe_train(df, n_merges=8)
    seg = {r.doc_id: (r.subwords, r.n_subwords) for r in bpe_apply(df, merges).collect()}
    for i, t in enumerate(TEXTS):
        expect = []
        for w in " ".join(t.lower().split()).split(" "):
            if w:
                expect += ref_words[w]
        assert seg[i][0] == expect
        assert seg[i][1] == len(expect)


def test_bpe_repartition_invariant(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS * 3)], "doc_id long, text string"
    )
    m1, _ = bpe_train(df, n_merges=6)
    m2, _ = bpe_train(df.repartition(7), n_merges=6)
    assert m1 == m2
