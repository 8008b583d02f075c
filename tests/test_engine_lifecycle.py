"""Engine lifecycle + token vending end-to-end (SURVEY.md §3.1-3.2),
plus the bucket store's LWW / retention / delete semantics."""

from __future__ import annotations

import pytest

from aws_greengrass_labs_database_influxdb_spark.control import (
    CredentialsProvider,
    Engine,
    EngineConfig,
)
from aws_greengrass_labs_database_influxdb_spark.sources.bucket import DAY_NS, BucketStore
from aws_greengrass_labs_database_influxdb_spark.sources.lineprotocol import parse_lines

GOOD_SECRET = {"influxdb_username": "edge_user", "influxdb_password": "Sup3rSecret#Pass!A"}

RESPONSE_KEYS = {
    "InfluxDBContainerName", "InfluxDBOrg", "InfluxDBBucket", "InfluxDBPort",
    "InfluxDBInterface", "InfluxDBServerProtocol", "InfluxDBSkipTLSVerify",
    "InfluxDBTokenAccessType", "InfluxDBToken",
}


@pytest.fixture()
def engine(spark, tmp_path):
    cfg = EngineConfig(store_root=str(tmp_path / "store"))
    e = Engine(spark, cfg)
    e.setup(CredentialsProvider(GOOD_SECRET))
    e.serve()
    yield e
    e.close()


def test_setup_is_idempotent(engine):
    engine.setup(CredentialsProvider(GOOD_SECRET))  # no error, no dup tokens
    assert len(engine.tokens.list_records()) == 3


def test_setup_rejects_weak_password(spark, tmp_path):
    e = Engine(spark, EngineConfig(store_root=str(tmp_path / "s2")))
    with pytest.raises(ValueError):
        e.setup(CredentialsProvider({"influxdb_username": "u", "influxdb_password": "weak"}))


def test_ping(engine):
    assert engine.ping() == "OK"


def test_token_vending_roundtrip(engine):
    """The component's only 'query': request on topic → response with the
    full connection-metadata contract (README.md:271-286 shape)."""
    responses = []
    engine.broker.subscribe(engine.config.response_topic, lambda t, m: responses.append(m))
    engine.broker.publish(
        engine.config.request_topic, {"action": "RetrieveToken", "accessLevel": "RW"}
    )
    assert len(responses) == 1
    resp = responses[0]
    assert set(resp) == RESPONSE_KEYS
    assert resp["InfluxDBTokenAccessType"] == "RW"
    assert resp["InfluxDBOrg"] == "greengrass"
    assert resp["InfluxDBBucket"] == "greengrass-telemetry"
    rw_token = resp["InfluxDBToken"]
    assert rw_token

    # RO returns a different token; invalid action returns nothing
    engine.broker.publish(
        engine.config.request_topic, {"action": "RetrieveToken", "accessLevel": "RO"}
    )
    assert responses[1]["InfluxDBToken"] != rw_token
    engine.broker.publish(engine.config.request_topic, {"action": "WrongAction"})
    engine.broker.publish(
        engine.config.request_topic, {"action": "RetrieveToken", "accessLevel": "Nope"}
    )
    assert len(responses) == 2  # invalid requests publish no response


# -------------------------------------------------------------- bucket store

def _points_df(spark, lines, default_ns=0):
    rows = parse_lines(lines, default_time_ns=default_ns)
    from aws_greengrass_labs_database_influxdb_spark.schema import POINTS_SCHEMA
    import pandas as pd

    pdf = pd.DataFrame(rows)
    pdf["time"] = pd.to_datetime(pdf["time_ns"] // 1000, unit="us")
    return spark.createDataFrame(pdf[[f.name for f in POINTS_SCHEMA.fields]], POINTS_SCHEMA)


def test_bucket_lww_upsert(spark, tmp_path):
    store = BucketStore(spark, str(tmp_path / "b"))
    store.create_bucket("o", "b")
    t = 1704067200_000_000_000
    store.write_points("o", "b", _points_df(spark, [f"cpu,host=h1 usage=1.0 {t}"]))
    # same series+timestamp+field written again → overwrites (LWW)
    df2 = _points_df(spark, [f"cpu,host=h1 usage=2.0 {t}"]).withColumn(
        "ingest_seq", __import__("pyspark.sql.functions", fromlist=["lit"]).lit(10)
    )
    store.write_points("o", "b", df2)
    out = store.read_points("o", "b").collect()
    assert len(out) == 1
    assert out[0].f_float == 2.0

    # compaction makes it durable; raw row count drops to 1
    store.compact("o", "b")
    raw = store.read_points("o", "b", lww=False).collect()
    assert len(raw) == 1 and raw[0].f_float == 2.0


def test_bucket_retention_drops_old_partitions(spark, tmp_path):
    store = BucketStore(spark, str(tmp_path / "r"))
    store.create_bucket("o", "b", retention_ns=2 * DAY_NS)
    old_t = 1704067200_000_000_000  # day N
    new_t = old_t + 10 * DAY_NS
    store.write_points(
        "o", "b", _points_df(spark, [f"m v=1 {old_t}", f"m v=2 {new_t}"])
    )
    dropped = store.enforce_retention("o", "b", now_ns=new_t + 1)
    assert dropped == 1
    rows = store.read_points("o", "b").collect()
    assert len(rows) == 1 and rows[0].f_float == 2.0


def test_bucket_delete_predicate(spark, tmp_path):
    from pyspark.sql import functions as F

    store = BucketStore(spark, str(tmp_path / "d"))
    store.create_bucket("o", "b")
    t = 1704067200_000_000_000
    store.write_points(
        "o",
        "b",
        _points_df(
            spark,
            [f"m,host=h1 v=1 {t}", f"m,host=h2 v=2 {t}", f"m,host=h1 v=3 {t + DAY_NS}"],
        ),
    )
    # delete host=h1 within [t, t+1h) only
    store.delete_predicate(
        "o", "b", t, t + 3600 * 10**9, predicate=F.col("tags")["host"] == "h1"
    )
    rows = {(r.tags["host"], r.f_float) for r in store.read_points("o", "b").collect()}
    assert rows == {("h2", 2.0), ("h1", 3.0)}


def test_bucket_delete_predicate_keeps_untagged_points(spark, tmp_path):
    """A tag predicate is NULL for points lacking the tag; those points
    must survive the delete (InfluxDB deletes only matching series)."""
    from pyspark.sql import functions as F

    store = BucketStore(spark, str(tmp_path / "dn"))
    store.create_bucket("o", "b")
    t = 1704067200_000_000_000
    store.write_points(
        "o",
        "b",
        _points_df(
            spark,
            [f"m,host=h1 v=1 {t}", f"m v=2 {t + 1}", f"m,region=eu v=3 {t + 2}"],
        ),
    )
    store.delete_predicate(
        "o", "b", t, t + 3600 * 10**9, predicate=F.col("tags")["host"] == "h1"
    )
    vals = sorted(r.f_float for r in store.read_points("o", "b").collect())
    assert vals == [2.0, 3.0]


def test_compact_clusters_day_files(spark, tmp_path):
    """Compaction consolidates each (measurement, day) into one file,
    sorted by (series_key, time_ns) — tight parquet row-group time
    stats + RLE-friendly series columns."""
    import glob

    import pyarrow.parquet as pq

    store = BucketStore(spark, str(tmp_path / "c"))
    store.create_bucket("o", "b")
    t = 1704067200_000_000_000
    # three appends, shuffled order across hosts and times, one day
    for batch in range(3):
        lines = [
            f"cpu,host=h{(batch * 7 + i) % 3} usage={float(i)} {t + ((i * 37) % 50) * 60_000_000_000}"
            for i in range(20)
        ]
        store.write_points("o", "b", _points_df(spark, lines))
    store.compact("o", "b")
    files = glob.glob(
        str(tmp_path / "c" / "o" / "b" / "data" / "measurement=cpu" / "day=*" / "*.parquet")
    )
    days = {f.rsplit("day=", 1)[1].split("/")[0] for f in files}
    assert files, "compacted day files must exist"
    assert len(files) == len(days)  # one file per day partition
    for f in files:
        tb = pq.read_table(f, columns=["series_key", "time_ns"]).to_pydict()
        pairs = list(zip(tb["series_key"], tb["time_ns"]))
        assert pairs == sorted(pairs)
