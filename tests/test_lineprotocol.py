"""Line-protocol parser tests.

Grammar cases mirror the public InfluxDB 2.0 line-protocol spec the
reference's data plane accepts (write path: /root/reference/README.md:292-297).
"""

from decimal import Decimal

import pytest

from aws_greengrass_labs_database_influxdb_spark.sources.lineprotocol import (
    LineProtocolError,
    parse_line,
    parse_lines,
)


def test_basic_multi_field():
    pts = parse_line("cpu,host=h1 usage=0.64,idle=12i 1700000000000000000")
    assert len(pts) == 2
    assert pts[0]["measurement"] == "cpu"
    assert pts[0]["tags"] == {"host": "h1"}
    assert pts[0]["field"] == "usage"
    assert pts[0]["f_float"] == 0.64
    assert pts[1]["f_int"] == 12
    assert pts[1]["ftype"] == "int"
    assert pts[0]["time_ns"] == 1700000000000000000


def test_all_five_field_types():
    pts = parse_line('m f=1.5,i=-3i,u=9u,s="x",b=false 1')
    types = {p["field"]: p["ftype"] for p in pts}
    assert types == {"f": "float", "i": "int", "u": "uint", "s": "string", "b": "bool"}
    assert pts[2]["f_uint"] == Decimal(9)
    assert pts[4]["f_bool"] is False


def test_escaped_measurement_tag_field():
    pts = parse_line(r"my\,meas,tag\ key=va\=lue field\ one=2.5 7")
    assert pts[0]["measurement"] == "my,meas"
    assert pts[0]["tags"] == {"tag key": "va=lue"}
    assert pts[0]["field"] == "field one"


def test_string_value_with_separators_and_quotes():
    pts = parse_line('m f="he said \\"hi\\", bye" 5')
    assert pts[0]["f_str"] == 'he said "hi", bye'


def test_no_timestamp_defaults():
    pts = parse_lines(["m v=1"], default_time_ns=123)
    assert pts[0]["time_ns"] == 123
    assert pts[0]["ingest_seq"] == 0


def test_precision_scaling():
    assert parse_line("m v=1 1700000000", precision="s")[0]["time_ns"] == 1700000000 * 10**9
    assert parse_line("m v=1 1700000000000", precision="ms")[0]["time_ns"] == 1700000000 * 10**9


def test_bool_variants():
    for raw, want in [("t", True), ("TRUE", True), ("f", False), ("False", False)]:
        assert parse_line(f"m v={raw} 1")[0]["f_bool"] is want


def test_comments_and_blank_skipped():
    assert parse_line("# comment") == []
    assert parse_line("   ") == []


@pytest.mark.parametrize(
    "bad",
    ["m", "m,t=1", "m f= 1", 'm f="unterminated 1', "m f=notanumber 1", "m f=1 notatime"],
)
def test_malformed_raises(bad):
    with pytest.raises(LineProtocolError):
        parse_line(bad)


def test_multi_line_sequence():
    pts = parse_lines(["a v=1 10", "b v=2,w=3 20"])
    assert [p["ingest_seq"] for p in pts] == [0, 1, 2]
    assert {p["measurement"] for p in pts} == {"a", "b"}
