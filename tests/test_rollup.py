"""Materialized-downsample routing: rollup partials must answer any
coarser aggregateWindow identically to computing from raw points."""

from __future__ import annotations

import pytest

from aws_greengrass_labs_database_influxdb_spark.operators.windows import aggregate_window
from aws_greengrass_labs_database_influxdb_spark.plans.rollup import (
    RollupCatalog,
    build_rollup,
    reaggregate,
)

MIN_NS = 60 * 10**9
HOUR_NS = 3600 * 10**9
BY = ("measurement", "field")

RANGE_START = 1704067200 * 10**9
RANGE_STOP = RANGE_START + 30 * 86_400 * 10**9


def _key(r):
    return tuple(r[c] for c in (*BY, "_start_ns"))


def test_reaggregate_matches_direct(points):
    rp = build_rollup(points, MIN_NS, BY).cache()
    for fn in ("count", "min", "max"):
        routed = {_key(r): r[fn] for r in reaggregate(rp, HOUR_NS, fn, BY).collect()}
        direct = {_key(r): r[fn] for r in aggregate_window(points, HOUR_NS, fn, by=BY).collect()}
        assert routed == direct, fn
    # float sums/means: rollup path is decimal-exact; direct F.sum/avg is
    # order-dependent — equal to ~1e-9 relative
    for fn in ("sum", "mean"):
        routed = {_key(r): r[fn] for r in reaggregate(rp, HOUR_NS, fn, BY).collect()}
        direct = {_key(r): r[fn] for r in aggregate_window(points, HOUR_NS, fn, by=BY).collect()}
        assert routed.keys() == direct.keys()
        for k in routed:
            assert routed[k] == pytest.approx(direct[k], rel=1e-9), fn


def test_reaggregate_create_empty_spine(points):
    rp = build_rollup(points, MIN_NS, BY)
    routed = reaggregate(
        rp, HOUR_NS, "count", BY,
        create_empty=True, range_start=RANGE_START, range_stop=RANGE_STOP,
    ).collect()
    direct = aggregate_window(
        points, HOUR_NS, "count", by=BY,
        create_empty=True, range_start=RANGE_START, range_stop=RANGE_STOP,
    ).collect()
    assert len(routed) == len(direct) == 30 * 24  # one series, full spine
    assert {_key(r): r["count"] for r in routed} == {
        _key(r): r["count"] for r in direct
    }


def test_catalog_routing_rules(points, tmp_path):
    cat = RollupCatalog(points.sparkSession, str(tmp_path / "rollups"))
    cat.materialize("m1", points, "1m", BY)
    cat.materialize("m5", points, "5m", BY)
    assert cat.route("1h", "mean", BY).name == "m5"  # coarsest divisor wins
    assert cat.route("2m", "sum", BY).name == "m1"  # 5m doesn't divide 2m
    assert cat.route("7s", "sum", BY) is None  # nothing divides
    assert cat.route("1h", "stddev", BY) is None  # not derivable
    assert cat.route("1h", "mean", ("measurement",)) is None  # group mismatch


def test_catalog_aggregate_window_routes_and_falls_back(points, tmp_path):
    cat = RollupCatalog(points.sparkSession, str(tmp_path / "rollups"))
    cat.materialize("m1", points, "1m", BY)
    routed = cat.aggregate_window(points, "1h", "count", by=BY).collect()
    direct = aggregate_window(points, "1h", "count", by=BY).collect()
    assert {_key(r): r["count"] for r in routed} == {_key(r): r["count"] for r in direct}
    # non-routable fn falls back to raw points, same output shape
    fb = cat.aggregate_window(points, "1h", "stddev", by=BY)
    assert "stddev" in fb.columns and fb.count() > 0
    # range filter prunes and bounds the result
    bounded = cat.aggregate_window(
        points, "1h", "count", by=BY, create_empty=True,
        range_start=RANGE_START, range_stop=RANGE_START + 86_400 * 10**9,
    )
    assert bounded.count() == 24
    direct_bounded = aggregate_window(
        points.filter(f"time_ns >= {RANGE_START} and time_ns < {RANGE_START + 86_400 * 10**9}"),
        "1h", "count", by=BY, create_empty=True,
        range_start=RANGE_START, range_stop=RANGE_START + 86_400 * 10**9,
    )
    assert {_key(r): r["count"] for r in bounded.collect()} == {
        _key(r): r["count"] for r in direct_bounded.collect()
    }


def test_routing_guards_fall_back_to_direct(points, tmp_path):
    """Unaligned range bounds, too-narrow persisted sum_dtype, and a
    stale watermark must each refuse routing (ADVICE r1)."""
    cat = RollupCatalog(points.sparkSession, str(tmp_path / "rollups"))
    spec = cat.materialize("m1", points, "1m", BY)
    assert spec.sum_dtype == "decimal(12,2)" and spec.watermark_ns is not None

    # (a) range start mid-window: routed must equal direct (fallback),
    # i.e. include the partial boundary window's in-range points only
    off_start = RANGE_START + 30 * 10**9  # 30s into the first window
    routed = cat.aggregate_window(
        points, "1h", "count", by=BY,
        range_start=off_start, range_stop=RANGE_START + 86_400 * 10**9,
    )
    direct = aggregate_window(
        points.filter(f"time_ns >= {off_start} and time_ns < {RANGE_START + 86_400 * 10**9}"),
        "1h", "count", by=BY,
    )
    assert {_key(r): r["count"] for r in routed.collect()} == {
        _key(r): r["count"] for r in direct.collect()
    }

    # (b) sum needing more decimal places than the persisted partials
    assert cat.route("1h", "sum", BY, min_sum_dtype="decimal(20,6)") is None
    assert cat.route("1h", "sum", BY, min_sum_dtype="decimal(12,2)") is not None
    assert cat.route("1h", "count", BY, min_sum_dtype="decimal(20,6)") is not None

    # (c) writes after materialize → stale rollup refused
    fresh = cat.aggregate_window(
        points, "1h", "count", by=BY, source_max_time_ns=spec.watermark_ns - 1
    )
    stale = cat.aggregate_window(
        points, "1h", "count", by=BY, source_max_time_ns=spec.watermark_ns
    )
    # both still produce the right answer; the stale one just came from raw
    assert {_key(r): r["count"] for r in fresh.collect()} == {
        _key(r): r["count"] for r in stale.collect()
    }


def test_refresh_days_incremental(points, tmp_path):
    spark = points.sparkSession
    cat = RollupCatalog(spark, str(tmp_path / "rollups"))
    day0 = points.filter(f"time_ns div {86_400 * 10**9} = {RANGE_START // (86_400 * 10**9)}")
    # materialize from data missing day 0, then refresh day 0 in
    cat.materialize("m1", points.subtract(day0), "1m", BY)
    before = cat.read("m1").filter(f"_day = {RANGE_START // (86_400 * 10**9)}").count()
    assert before == 0
    cat.refresh_days("m1", day0, [RANGE_START // (86_400 * 10**9)])
    full = build_rollup(points, MIN_NS, BY)
    assert cat.read("m1").count() == full.count()
