"""Metamorphic relations over the Flux/InfluxQL frontends.

Differential/oracle tests pin exact values; these pin *relations* that
must hold for ANY correct engine — commuting filters, partition sums,
identity limits, shift/window commutation — over seeded-random
parameters. They catch silent-wrong compilation (the class ADVICE
keeps finding) without needing a hand-written oracle per query.
"""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from aws_greengrass_labs_database_influxdb_spark.frontends import (
    execute_flux,
    execute_influxql,
)
from aws_greengrass_labs_database_influxdb_spark.sources.io import events_points

RANGE = (
    'range(start: 2024-01-03T00:00:00Z, stop: 2024-01-20T00:00:00Z)'
)


@pytest.fixture(scope="module")
def pts(spark, sf_dir):
    return events_points(spark, sf_dir).cache()


def _vals(df, cols=("time_ns", "f_float")):
    out = []
    for r in df.collect():
        out.append(tuple(
            round(r[c], 9) if isinstance(r[c], float) else r[c] for c in cols
        ))
    return sorted(out)


def test_filter_conjunction_commutes(pts):
    rng = random.Random(80)
    for _ in range(4):
        thr = round(rng.uniform(10, 60), 2)
        et = rng.choice(["click", "view", "purchase"])
        a = f"|> filter(fn: (r) => r._value > {thr})"
        b = f'|> filter(fn: (r) => r.event_type == "{et}")'
        both = (
            f'|> filter(fn: (r) => r._value > {thr} and '
            f'r.event_type == "{et}")'
        )
        base = f'from(bucket:"b") |> {RANGE} '
        r1 = _vals(execute_flux(pts, base + f"{a} {b}"))
        r2 = _vals(execute_flux(pts, base + f"{b} {a}"))
        r3 = _vals(execute_flux(pts, base + both))
        assert r1 == r2 == r3 and r1


def test_group_partition_sum_equals_total(pts):
    """sum() over any grouping partitions the total sum; count() too."""
    base = f'from(bucket:"b") |> {RANGE} '
    total = execute_flux(
        pts, base + "|> group(columns: []) |> sum()"
    ).collect()[0]["sum"]
    for cols in ('["event_type"]', '["event_type", "user_id"]'):
        parts = execute_flux(
            pts, base + f"|> group(columns: {cols}) |> sum()"
        ).agg(F.sum("sum")).collect()[0][0]
        assert abs(parts - total) < 1e-6 * max(1.0, abs(total))


def test_window_count_partitions_total(pts):
    rng = random.Random(81)
    base = f'from(bucket:"b") |> {RANGE} |> group(columns: ["event_type"]) '
    total = execute_flux(pts, base + "|> count()").agg(
        F.sum("count")
    ).collect()[0][0]
    for _ in range(3):
        every = rng.choice(["37m", "2h", "1d", "3d"])
        winsum = execute_flux(
            pts, base + f"|> aggregateWindow(every: {every}, fn: count)"
        ).agg(F.sum("f_float")).collect()[0][0]
        assert winsum == total, every


def test_big_limit_and_sort_are_identity_for_aggregates(pts):
    base = f'from(bucket:"b") |> {RANGE} |> group(columns: ["event_type"]) '
    plain = _vals(execute_flux(pts, base + "|> mean()"), ("mean",))
    with_noise = _vals(
        execute_flux(
            pts,
            base + '|> sort(columns: ["_value"], desc: true) '
            "|> limit(n: 99999999) |> mean()",
        ),
        ("mean",),
    )
    assert plain == with_noise and plain


def test_map_linear_scales_sum(pts):
    base = f'from(bucket:"b") |> {RANGE} |> group(columns: ["event_type"]) '
    s0 = _vals(execute_flux(pts, base + "|> sum()"), ("event_type", "sum"))
    s2 = execute_flux(
        pts,
        base + "|> map(fn: (r) => ({r with _value: r._value * 2.0})) |> sum()",
    ).collect()
    got = sorted((r["event_type"], round(r["sum"] / 2.0, 9)) for r in s2)
    want = [(et, round(v, 9)) for et, v in s0]
    assert [g[0] for g in got] == [w[0] for w in want]
    for (_, g), (_, w) in zip(got, want):
        assert abs(g - w) < 1e-6 * max(1.0, abs(w))


def test_timeshift_commutes_with_aligned_window(pts):
    """timeShift(1h) |> aggregateWindow(1h) == aggregateWindow(1h) with
    starts shifted by exactly 1h (alignment-preserving shift)."""
    base = f'from(bucket:"b") |> {RANGE} |> group(columns: ["event_type"]) '
    shifted = execute_flux(
        pts,
        base + '|> timeShift(duration: 1h) '
        "|> aggregateWindow(every: 1h, fn: mean)",
    ).select("event_type", "time_ns", "f_float").collect()
    plain = execute_flux(
        pts, base + "|> aggregateWindow(every: 1h, fn: mean)"
    ).select("event_type", "time_ns", "f_float").collect()
    H = 3600 * 10**9
    got = sorted(
        (r["event_type"], r["time_ns"] - H, round(r["f_float"], 9))
        for r in shifted if r["f_float"] is not None
    )
    want = sorted(
        (r["event_type"], r["time_ns"], round(r["f_float"], 9))
        for r in plain if r["f_float"] is not None
    )
    assert got == want and got


def test_influxql_where_conjunction_commutes(pts):
    rng = random.Random(82)
    for _ in range(3):
        thr = round(rng.uniform(10, 60), 2)
        et = rng.choice(["click", "view"])
        q1 = (
            f"SELECT sum(value) AS s FROM events WHERE value > {thr} "
            f"AND event_type = '{et}' AND time >= '2024-01-03' "
            "AND time < '2024-01-20'"
        )
        q2 = (
            "SELECT sum(value) AS s FROM events WHERE time >= '2024-01-03' "
            f"AND time < '2024-01-20' AND event_type = '{et}' "
            f"AND value > {thr}"
        )
        r1 = execute_influxql(pts, q1, tag_cols=("event_type",)).collect()
        r2 = execute_influxql(pts, q2, tag_cols=("event_type",)).collect()
        v1 = [round(r["s"], 9) for r in r1]
        v2 = [round(r["s"], 9) for r in r2]
        assert v1 == v2 and v1


def test_influxql_group_by_time_partitions_count(pts):
    q = (
        "SELECT count(value) AS n FROM events WHERE time >= '2024-01-03' "
        "AND time < '2024-01-20' GROUP BY time({g})"
    )
    total = execute_influxql(
        pts,
        "SELECT count(value) AS n FROM events WHERE time >= '2024-01-03' "
        "AND time < '2024-01-20'",
    ).collect()[0]["n"]
    for g in ("90m", "1d"):
        rows = execute_influxql(pts, q.format(g=g)).collect()
        assert sum(r["n"] for r in rows if r["n"]) == total, g
