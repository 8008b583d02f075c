"""Timezone-aware windows — Flux ``option location`` (SURVEY.md §2.2.6).

Window boundaries must land on LOCAL wall-clock marks: a 1d window at a
DST transition is the 23- or 25-hour local day, month windows start at
local midnight of the 1st. Golden values pinned against the IANA tzdb
(America/Chicago 2024: spring-forward Mar 10, fall-back Nov 3).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

import aws_greengrass_labs_database_influxdb_spark.operators as ops
from aws_greengrass_labs_database_influxdb_spark.frontends.flux import execute_flux

H = 3600 * 10**9
CHI = "America/Chicago"


def _ns(*args) -> int:
    return int(dt.datetime(*args, tzinfo=dt.timezone.utc).timestamp()) * 10**9


def mk(spark, rows):
    """rows: (time_ns, value)  — one series."""
    return spark.createDataFrame(
        [("m", "v", t, float(v), i) for i, (t, v) in enumerate(rows)],
        "measurement string, field string, time_ns long, f_float double,"
        " ingest_seq long",
    ).withColumn("time", F.timestamp_micros((F.col("time_ns") / 1000).cast("long")))


def test_spring_forward_23h_local_day(spark):
    # Mar 10 2024: CST→CDT at 08:00Z; local midnights are Mar 9 @06Z,
    # Mar 10 @06Z, Mar 11 @05Z (the 23-hour day), Mar 12 @05Z.
    rows = [
        (_ns(2024, 3, 10, 5, 30), 1.0),   # Mar 9 23:30 local
        (_ns(2024, 3, 10, 6, 30), 2.0),   # Mar 10 00:30 local
        (_ns(2024, 3, 11, 4, 30), 3.0),   # Mar 10 23:30 local
        (_ns(2024, 3, 11, 5, 30), 4.0),   # Mar 11 00:30 local
    ]
    out = ops.aggregate_window(
        mk(spark, rows), "1d", "count", by=["measurement", "field"], tz=CHI
    ).orderBy("_start_ns").collect()
    got = [(r._start_ns, r._stop_ns, r["count"]) for r in out]
    assert got == [
        (_ns(2024, 3, 9, 6), _ns(2024, 3, 10, 6), 1),
        (_ns(2024, 3, 10, 6), _ns(2024, 3, 11, 5), 2),   # 23-hour day
        (_ns(2024, 3, 11, 5), _ns(2024, 3, 12, 5), 1),
    ]
    assert got[1][1] - got[1][0] == 23 * H


def test_fall_back_25h_local_day(spark):
    # Nov 3 2024 local day = [05:00Z Nov 3, 06:00Z Nov 4) — 25 hours.
    rows = [(_ns(2024, 11, 3, 5) + k * H, float(k)) for k in range(25)]
    out = ops.aggregate_window(
        mk(spark, rows), "1d", "count", by=["measurement", "field"], tz=CHI
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r._start_ns, r._stop_ns, r["count"]) == (
        _ns(2024, 11, 3, 5), _ns(2024, 11, 4, 6), 25
    )
    assert r._stop_ns - r._start_ns == 25 * H


def test_window_op_assigns_local_bounds(spark):
    rows = [(_ns(2024, 3, 10, 7), 1.0)]  # Mar 10 01:00 local
    out = ops.window(mk(spark, rows), "1d", tz=CHI).collect()[0]
    assert out._start_ns == _ns(2024, 3, 10, 6)
    assert out._stop_ns == _ns(2024, 3, 11, 5)


def test_month_window_local_midnight(spark):
    rows = [(_ns(2024, 3, 15, 12), 1.0)]
    out = ops.window(mk(spark, rows), "1mo", tz=CHI).collect()[0]
    # local Mar 1 midnight = 06:00Z (CST); Apr 1 midnight = 05:00Z (CDT)
    assert out._start_ns == _ns(2024, 3, 1, 6)
    assert out._stop_ns == _ns(2024, 4, 1, 5)


def test_create_empty_spine_matches_local_lattice(spark):
    # 3 local days in range, data only on the middle one
    rows = [(_ns(2024, 3, 10, 12), 5.0)]
    out = ops.aggregate_window(
        mk(spark, rows), "1d", "count", by=["measurement", "field"],
        create_empty=True, tz=CHI,
        range_start=_ns(2024, 3, 9, 6), range_stop=_ns(2024, 3, 12, 5),
    ).orderBy("_start_ns").collect()
    got = [(r._start_ns, r._stop_ns, r["count"]) for r in out]
    assert got == [
        (_ns(2024, 3, 9, 6), _ns(2024, 3, 10, 6), 0),
        (_ns(2024, 3, 10, 6), _ns(2024, 3, 11, 5), 1),
        (_ns(2024, 3, 11, 5), _ns(2024, 3, 12, 5), 0),
    ]


def test_sliding_window_local_lattice(spark):
    # every: 1h, period: 2h in Chicago across spring-forward: a row at
    # 01:30 local belongs to the windows starting 00:00 and 01:00
    # local; both stop at local 03:00/02:00 which resolve to 08:00Z
    # (the 02:00 hour does not exist on 2024-03-10)
    rows = [(_ns(2024, 3, 10, 7, 30), 1.0)]  # 01:30 CST
    out = ops.window(
        mk(spark, rows), H, period=2 * H, tz=CHI
    ).orderBy("_start_ns").collect()
    got = [(r._start_ns, r._stop_ns) for r in out]
    assert got == [
        (_ns(2024, 3, 10, 6), _ns(2024, 3, 10, 8)),   # [00:00, 02:00) local
        (_ns(2024, 3, 10, 7), _ns(2024, 3, 10, 8)),   # [01:00, 03:00) local
    ]


def test_sliding_window_tz_matches_utc_semantics_on_fixed_zone(spark):
    """On a fixed-offset zone, sliding membership must equal the UTC
    path run on shifted timestamps (same lattice, shifted)."""
    rows = [(_ns(2024, 6, 1, 3, 17) + k * 1800 * 10**9, float(k)) for k in range(8)]
    tz = "GMT-08:00"
    off = -8 * H
    a = ops.window(mk(spark, rows), H, period=3 * H, tz=tz).select(
        "time_ns", "_start_ns"
    ).collect()
    b = ops.window(
        mk(spark, [(t + off, v) for t, v in rows]), H, period=3 * H
    ).select("time_ns", "_start_ns").collect()
    got_a = sorted((r.time_ns, r._start_ns) for r in a)
    got_b = sorted((r.time_ns - off, r._start_ns - off) for r in b)
    assert got_a == got_b


def test_fixed_offset_matches_integer_mirror(spark):
    """Metamorphic check: for a FIXED-offset zone, local bucketing is
    exactly UTC bucketing of (t + off) shifted back — an integer
    identity `start = floor((t+off)/e)*e - off` with no tz database
    involved. Random µs-aligned timestamps across 2001–2033, both
    offset signs, sub-day and day widths."""
    import random

    rng = random.Random(11)
    for off_h, every_n in [(-8, 86400 * 10**9), (5, 86400 * 10**9),
                           (-6, 6 * H), (9, H)]:
        off = off_h * H
        tz = f"GMT{'+' if off_h > 0 else '-'}{abs(off_h):02d}:00"
        ts = [rng.randrange(10**9, 2 * 10**9) * 10**6 for _ in range(60)]
        ts += [((t + off) // every_n) * every_n - off + d * 10**6
               for t in ts[:5] for d in (-1, 0, 1)]
        out = ops.window(
            mk(spark, [(t, 1.0) for t in ts]), every_n, tz=tz
        ).select("time_ns", "_start_ns", "_stop_ns").collect()
        for r in out:
            want = ((r.time_ns + off) // every_n) * every_n - off
            assert r._start_ns == want, (tz, every_n, r.time_ns)
            assert r._stop_ns == want + every_n


# ------------------------------------------------------------ Flux frontend

def test_flux_option_location_named_zone(spark):
    rows = [
        (_ns(2024, 3, 10, 5, 30), 1.0),
        (_ns(2024, 3, 10, 6, 30), 2.0),
        (_ns(2024, 3, 11, 4, 30), 3.0),
    ]
    q = '''
import "timezone"
option location = timezone.location(name: "America/Chicago")
from(bucket: "b")
  |> range(start: 2024-03-09T00:00:00Z, stop: 2024-03-12T00:00:00Z)
  |> aggregateWindow(every: 1d, fn: count)
'''
    out = execute_flux(mk(spark, rows), q).orderBy("time_ns").collect()
    # timeSrc defaults to _stop → local midnights
    assert [r.time_ns for r in out] == [_ns(2024, 3, 10, 6), _ns(2024, 3, 11, 5)]
    assert [r.f_float for r in out] == [1.0, 2.0]


def test_flux_timezone_fixed_offset(spark):
    rows = [(_ns(2024, 6, 1, 7), 1.0), (_ns(2024, 6, 1, 9), 2.0)]
    q = '''
import "timezone"
option location = timezone.fixed(offset: -8h)
from(bucket: "b")
  |> range(start: 2024-05-31T00:00:00Z, stop: 2024-06-02T00:00:00Z)
  |> aggregateWindow(every: 1d, fn: count)
'''
    out = execute_flux(mk(spark, rows), q).orderBy("time_ns").collect()
    # UTC-8 day boundaries at 08:00Z: 07Z is May 31 local, 09Z is Jun 1
    assert [r.time_ns for r in out] == [_ns(2024, 6, 1, 8), _ns(2024, 6, 2, 8)]
    assert [r.f_float for r in out] == [1.0, 1.0]


def test_flux_per_call_location_overrides(spark):
    rows = [(_ns(2024, 3, 10, 7), 1.0)]
    q = '''
from(bucket: "b")
  |> range(start: 2024-03-09T00:00:00Z, stop: 2024-03-12T00:00:00Z)
  |> window(every: 1d, location: timezone.location(name: "America/Chicago"))
'''
    out = execute_flux(mk(spark, rows), q).collect()[0]
    assert out["_start_ns"] == _ns(2024, 3, 10, 6)


def test_flux_hour_selection_local(spark):
    # 14:00Z = 08:00 Chicago (CST, Jan): inside local business hours,
    # outside them in UTC terms only if the tz is honored
    rows = [(_ns(2024, 1, 15, 14), 1.0), (_ns(2024, 1, 15, 4), 2.0)]
    q = '''
import "timezone"
option location = timezone.location(name: "America/Chicago")
from(bucket: "b")
  |> range(start: 2024-01-15T00:00:00Z, stop: 2024-01-16T00:00:00Z)
  |> hourSelection(start: 8, stop: 17)
'''
    out = execute_flux(mk(spark, rows), q).collect()
    assert [r.f_float for r in out] == [1.0]  # 04:00Z = 22:00 local → dropped


def test_flux_option_now_pins_relative_range(spark):
    rows = [(_ns(2024, 1, 1, 23, 30), 1.0), (_ns(2024, 1, 1, 10), 2.0)]
    q = '''
option now = () => 2024-01-02T00:00:00Z
from(bucket: "b") |> range(start: -1h) |> count()
'''
    out = execute_flux(mk(spark, rows), q).collect()
    assert len(out) == 1 and out[0]["count"] == 1
