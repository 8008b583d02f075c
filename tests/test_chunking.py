"""chunk_documents / pack_sequences golden tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_greengrass_labs_database_influxdb_spark.ext.chunking import chunk_documents, pack_sequences


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_chunks_overlap_and_tail(spark):
    text = " ".join(str(i) for i in range(10))  # 10 tokens
    df = _docs(spark, [(1, "s", text)])
    out = {r.chunk_id: r for r in chunk_documents(df, size=4, stride=3).collect()}
    # starts 0,3,6,9 → 4 chunks; last is the 1-token tail
    assert sorted(out) == [0, 1, 2, 3]
    assert out[0].chunk_text == "0 1 2 3"
    assert out[1].chunk_text == "3 4 5 6"
    assert out[3].chunk_text == "9"
    assert out[3].n_tokens == 1


def test_chunks_short_doc_single_chunk(spark):
    df = _docs(spark, [(1, "s", "a b")])
    out = chunk_documents(df, size=128, stride=96).collect()
    assert len(out) == 1
    assert out[0].chunk_text == "a b"
    assert out[0].n_tokens == 2


def test_chunks_no_shuffle_plan(spark):
    df = _docs(spark, [(1, "s", "a b c")])
    plan = chunk_documents(df, 4, 2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-side only


def test_pack_contiguous_fill(spark):
    df = _docs(
        spark,
        [(1, "s", "a b c"), (2, "s", "d e"), (3, "s", "f g h i"), (10, "t", "x y z")],
    )
    got = {r.doc_id: (r.pack_id, r.pack_offset, r.n_tokens)
           for r in pack_sequences(df, budget=5, by=("source",)).collect()}
    # source s: doc1 (3 tok) → pack0@0; doc2 (2) → pack0@3; doc3 (4) → pack1@0
    assert got[1] == (0, 0, 3)
    assert got[2] == (0, 3, 2)
    assert got[3] == (1, 0, 4)
    # source t packs independently
    assert got[10] == (0, 0, 3)


def test_pack_is_deterministic(spark):
    df = _docs(spark, [(i, f"s{i%3}", "w " * (i % 7 + 1)) for i in range(30)])
    a = sorted(map(tuple, pack_sequences(df, 16).collect()))
    b = sorted(map(tuple, pack_sequences(df, 16).collect()))
    assert a == b


def test_bad_args_raise(spark):
    df = _docs(spark, [(1, "s", "a")])
    with pytest.raises(ValueError):
        chunk_documents(df, size=0)
    with pytest.raises(ValueError):
        pack_sequences(df, budget=0)
