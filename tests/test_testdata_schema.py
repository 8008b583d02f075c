"""Testdata schema-drift guard (VERDICT r3 item 4).

The driver regenerates ``/root/testdata`` between rounds and has
already changed dtypes once (round 3: ``events.ts`` flipped from
parquet TIMESTAMP(NANOS) to TIMESTAMP(MICROS), crashing 29/50 driver
queries with an unreadable AnalysisException). This test loads every
table the suite touches and asserts the column/dtype contract the
loaders and oracles assume — so the next silent regeneration fails
HERE, with a readable message naming the drifted column.

Loader-level adaptivity lives in ``sources.io.events_points`` (it
accepts ts as LONG-ns, TIMESTAMP, or TIMESTAMP_NTZ); this test pins
everything else.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from aws_greengrass_labs_database_influxdb_spark.sources.io import TABLES, events_points, load_table

# column -> set of acceptable Spark dtype simpleStrings. Multiple
# entries where the loader is deliberately schema-adaptive.
EXPECTED = {
    "region": {"r_regionkey": {"int"}, "r_name": {"string"}},
    "nation": {"n_nationkey": {"int"}, "n_name": {"string"}, "n_regionkey": {"int"}},
    "customer": {
        "c_custkey": {"bigint"},
        "c_name": {"string"},
        "c_nationkey": {"int"},
        "c_acctbal": {"double"},
        "c_mktsegment": {"string"},
    },
    "supplier": {
        "s_suppkey": {"bigint"},
        "s_name": {"string"},
        "s_nationkey": {"int"},
        "s_acctbal": {"double"},
    },
    "part": {
        "p_partkey": {"bigint"},
        "p_name": {"string"},
        "p_brand": {"string"},
        "p_type": {"string"},
        "p_size": {"int"},
        "p_retailprice": {"double"},
    },
    "orders": {
        "o_orderkey": {"bigint"},
        "o_custkey": {"bigint"},
        "o_orderstatus": {"string"},
        "o_totalprice": {"double"},
        "o_orderdate": {"timestamp", "timestamp_ntz", "date"},
        "o_orderpriority": {"string"},
    },
    "lineitem": {
        "l_orderkey": {"bigint"},
        "l_partkey": {"bigint"},
        "l_suppkey": {"bigint"},
        "l_linenumber": {"int"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_tax": {"double"},
        "l_returnflag": {"string"},
        "l_linestatus": {"string"},
        "l_shipdate": {"timestamp", "timestamp_ntz", "date"},
    },
    "events": {
        "event_id": {"bigint"},
        # the three shapes events_points adapts to
        "ts": {"bigint", "timestamp", "timestamp_ntz"},
        "user_id": {"bigint"},
        "event_type": {"string"},
        "value": {"double"},
        "props": {"string"},
    },
    "documents": {
        "doc_id": {"bigint"},
        "text": {"string"},
        "lang": {"string"},
        "source": {"string"},
        "n_chars": {"bigint"},
    },
    "embeddings": {
        "vec_id": {"bigint"},
        "embedding": {"array<float>", "array<double>"},
        "label": {"int"},
    },
}


@pytest.mark.parametrize("table", TABLES)
def test_table_schema_contract(spark, sf_dir, table):
    df = load_table(spark, sf_dir, table)
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    expected = EXPECTED[table]
    missing = set(expected) - set(actual)
    assert not missing, (
        f"testdata drift: {table}.parquet lost column(s) {sorted(missing)} "
        f"(driver regenerated the table?); has {sorted(actual)}"
    )
    for col, allowed in expected.items():
        assert actual[col] in allowed, (
            f"testdata drift: {table}.{col} is {actual[col]!r}, loaders/"
            f"oracles assume one of {sorted(allowed)} — update "
            f"sources/io.py + suite oracles together"
        )


def test_events_points_canonical_schema(spark, sf_dir):
    """events_points must produce the canonical points shape regardless
    of which parquet ts dtype shipped."""
    p = events_points(spark, sf_dir)
    got = {f.name: f.dataType.simpleString() for f in p.schema.fields}
    assert got["time"] == "timestamp"
    assert got["time_ns"] == "bigint"
    assert got["f_float"] == "double"
    assert got["ingest_seq"] == "bigint"
    # _ts_raw keeps the raw scan dtype for sargable range predicates
    assert got["_ts_raw"] in {"bigint", "timestamp", "timestamp_ntz"}
    # time/time_ns agree (µs precision): spot-check one row
    row = p.selectExpr("unix_micros(time) * 1000 AS a", "time_ns AS b").first()
    assert row.a == row.b
