"""Layer A contract tests — ports of the reference's 19 unit-test
behaviors (test_influxDBTokenStreamHandler.py,
test_influxDBTokenPublisher.py, test_retrieveInfluxDBSecrets.py)
against our control plane. Same fixtures, same expected outcomes.
"""

from __future__ import annotations

import json

import pytest

from aws_greengrass_labs_database_influxdb_spark.control.broker import Broker
from aws_greengrass_labs_database_influxdb_spark.control.secrets import (
    CredentialsProvider,
    SecretFormatError,
    parse_secret_document,
    validate_password,
)
from aws_greengrass_labs_database_influxdb_spark.control.tokens import (
    ADMIN_SUFFIX,
    TokenRegistry,
)

# The canonical 3-token fixture shape (mirrors the reference's
# test_influxDBTokenStreamHandler.py:15-51 golden data).
TOKENS = [
    {
        "id": "0001",
        "description": "admin_user's Token",
        "token": "admin-token-value",
        "status": "active",
        "userName": "admin_user",
        "userID": "u1",
        "permissions": ["read:orgs", "write:orgs"],
    },
    {
        "id": "0002",
        "description": "greengrass_read",
        "token": "ro-token-value",
        "status": "active",
        "userName": "",
        "userID": "",
        "permissions": ["read:orgs/o1/buckets/b1"],
    },
    {
        "id": "0003",
        "description": "greengrass_readwrite",
        "token": "rw-token-value",
        "status": "active",
        "userName": "",
        "userID": "",
        "permissions": ["read:orgs/o1/buckets/b1", "write:orgs/o1/buckets/b1"],
    },
]


# ---------------------------------------------------------- token selection

def test_select_rw_token():
    assert TokenRegistry.select_token(TOKENS, "RW") == "rw-token-value"


def test_select_ro_token():
    assert TokenRegistry.select_token(TOKENS, "RO") == "ro-token-value"


def test_select_admin_token_by_suffix():
    assert TokenRegistry.select_token(TOKENS, "Admin") == "admin-token-value"


def test_select_invalid_access_level_returns_none():
    assert TokenRegistry.select_token(TOKENS, "Bogus") is None
    assert TokenRegistry.select_token(TOKENS, "") is None


def test_select_empty_token_raises():
    broken = [dict(t, token="") for t in TOKENS]
    with pytest.raises(ValueError):
        TokenRegistry.select_token(broken, "RW")


def test_select_malformed_admin_description_returns_none():
    # admin description that doesn't end with "'s Token" is not selected
    recs = [dict(TOKENS[0], description="admin_user token (malformed)")]
    assert TokenRegistry.select_token(recs, "Admin") is None


def test_registry_roundtrip_creates_reference_shape():
    reg = TokenRegistry()
    reg.create_admin("edge_user")
    reg.create_scoped("RO", "org1", "bkt1")
    reg.create_scoped("RW", "org1", "bkt1")
    recs = reg.list_records()
    assert [r["description"] for r in recs] == [
        f"edge_user{ADMIN_SUFFIX}",
        "greengrass_read",
        "greengrass_readwrite",
    ]
    assert recs[1]["permissions"] == ["read:orgs/org1/buckets/bkt1"]
    assert recs[2]["permissions"] == [
        "read:orgs/org1/buckets/bkt1",
        "write:orgs/org1/buckets/bkt1",
    ]
    assert all(set(r) == set(TOKENS[0]) for r in recs)  # record schema parity


def test_registry_empty_list_raises():
    with pytest.raises(RuntimeError):
        TokenRegistry().list_records()


# ----------------------------------------------------------------- secrets

def test_secret_parse_happy():
    doc = json.dumps({"influxdb_username": "u", "influxdb_password": "p"})
    assert parse_secret_document(doc) == ("u", "p")


def test_secret_parse_garbage_raises_keyerror():
    with pytest.raises(KeyError):
        parse_secret_document({"unrelated": 1})


def test_secret_parse_empty_values_raise():
    with pytest.raises(ValueError):
        parse_secret_document({"influxdb_username": "", "influxdb_password": "x"})


def test_credentials_provider_from_callable():
    cp = CredentialsProvider(lambda: {"influxdb_username": "u", "influxdb_password": "p"})
    assert cp.fetch() == ("u", "p")


def test_credentials_provider_failure_propagates():
    def boom():
        raise TimeoutError("IPC timeout")

    with pytest.raises(TimeoutError):
        CredentialsProvider(boom).fetch()


def test_secret_format_error_is_keyerror():
    assert issubclass(SecretFormatError, KeyError)


# ---------------------------------------------------------------- password

@pytest.mark.parametrize(
    "pwd",
    ["Abcdefgh1#zzzzzz", "LongEnough1!Special#", "XyZ9#aaaaaaaaaaaa"],
)
def test_password_valid(pwd):
    validate_password(pwd)


@pytest.mark.parametrize(
    "pwd",
    [
        "short1#A",                 # too short
        "alllowercase1#aaaaaaaa",   # no uppercase
        "ALLUPPERCASE1#AAAAAAAA",   # no lowercase
        "NoDigitsHere#Abcdefgh",    # no digit
        "NoSpecials12Abcdefgh",     # no special
        "",
    ],
)
def test_password_invalid(pwd):
    with pytest.raises(ValueError):
        validate_password(pwd)


# ------------------------------------------------------------------ broker

def test_broker_publish_subscribe_roundtrip():
    b = Broker()
    got = []
    b.subscribe("t", lambda topic, msg: got.append((topic, msg)))
    n = b.publish("t", {"x": 1})
    assert n == 1 and got == [("t", {"x": 1})]


def test_broker_handler_error_swallowed_stream_stays_open():
    b = Broker()
    got = []

    def bad(topic, msg):
        raise RuntimeError("boom")

    b.subscribe("t", bad)
    b.subscribe("t", lambda topic, msg: got.append(msg))
    assert b.publish("t", json.dumps({"ok": True})) == 1  # good handler still ran
    assert got == [{"ok": True}]
    assert b.publish("t", {"again": 1}) == 1  # subscription survived the error


def test_sql_to_roundtrip_embedded_derby(spark, tmp_path):
    """sql.to → sql.from round-trip against embedded Derby (the JDBC
    jars Spark ships): write a frame out, read it back, exact rows."""
    from aws_greengrass_labs_database_influxdb_spark.sources.aux_sources import sql_from, sql_to

    url = f"jdbc:derby:{tmp_path}/sqlto_db;create=true"
    drv = "org.apache.derby.jdbc.EmbeddedDriver"
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)],
        "id long, name string, score double",
    )
    sql_to(df.coalesce(1), url, "scores", driver=drv, mode="overwrite")
    back = sql_from(
        spark, url,
        'SELECT "id" AS id, "name" AS name, "score" AS score FROM scores',
        driver=drv,
    )
    assert sorted((r.ID, r.NAME, r.SCORE) for r in back.collect()) == [
        (1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)]
    # append mode adds rows
    sql_to(df.coalesce(1), url, "scores", driver=drv, mode="append")
    n = sql_from(spark, url, 'SELECT count(*) AS n FROM scores',
                 driver=drv).collect()[0][0]
    assert n == 6
