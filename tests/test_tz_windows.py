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


# ------------------------------------------------- randomized model gate

def _py_utc_off_ns(tz: str, ns: int) -> int:
    """UTC offset of ``tz`` at instant ``ns`` — independent zoneinfo
    model (not the repo's tz_offset_ns)."""
    import datetime as dt
    from zoneinfo import ZoneInfo

    if len(tz) > 3 and tz[:3] in ("GMT", "UTC") and tz[3] in "+-":
        sign = 1 if tz[3] == "-" else -1  # note: builds the offset TO ADD
        hh, _, mm = tz[4:].partition(":")
        return -sign * (int(hh) * 3600 + int(mm or 0) * 60) * 10**9
    d = dt.datetime.fromtimestamp(ns // 10**9, ZoneInfo(tz))
    return int(d.utcoffset().total_seconds()) * 10**9


def _py_local_to_instant_ns(tz: str, local: int) -> int:
    """Wall-clock ns → instant ns, resolving spring-forward-gap times
    the way java.time does (shift forward = interpret with the
    pre-transition offset, fold=0 in PEP 495 terms)."""
    import datetime as dt
    from zoneinfo import ZoneInfo

    if len(tz) > 3 and tz[:3] in ("GMT", "UTC") and tz[3] in "+-":
        return local - _py_utc_off_ns(tz, local)
    sec, sub = divmod(local, 10**9)
    naive = dt.datetime.fromtimestamp(sec, dt.timezone.utc).replace(tzinfo=None)
    z = naive.replace(tzinfo=ZoneInfo(tz), fold=0)
    return int(z.timestamp()) * 10**9 + sub


def test_tz_window_bucketing_matches_zoneinfo_model(spark):
    """Randomized gate over the tz window path: for ns-precision rows
    clustered around real DST transitions (NY, Berlin, Lord Howe's
    30-minute shift) and fixed offsets, window()'s _start_ns/_stop_ns
    must equal an independent zoneinfo bucketing model, and
    aggregate_window(createEmpty:) must emit exactly the local-lattice
    window set with per-window means (ADVICE r7 area: exact µs split +
    DST-gap stop derivation)."""
    import random

    from aws_greengrass_labs_database_influxdb_spark.operators.windows import (
        aggregate_window,
        duration_ns,
        tz_offset_ns,
        window,
    )

    rng = random.Random(8)
    transitions = {
        "America/New_York": [1710054000, 1730613600],   # 2024 Mar/Nov
        "Europe/Berlin": [1711846800, 1729990800],      # 2024 Mar/Oct
        "Australia/Lord_Howe": [1712415600, 1728116200],
        "GMT+05:30": [1710054000],
        "UTC": [1710054000],
    }
    configs = [
        ("America/New_York", "2h", "0"),
        ("America/New_York", "30m", "15m"),
        ("America/New_York", "1d", "0"),
        ("Europe/Berlin", "1h", "0"),
        ("Australia/Lord_Howe", "1h", "0"),
        ("Australia/Lord_Howe", "30m", "0"),
        ("GMT+05:30", "1d", "0"),
        ("UTC", "2h", "15m"),
    ]
    for tz, every, offset in configs:
        every_n, offset_n = duration_ns(every), duration_ns(offset)
        rows = []
        for base in transitions[tz]:
            for _ in range(40):
                t = (base + rng.randrange(-36 * 3600, 36 * 3600)) * 10**9
                t += rng.randrange(0, 10**9)  # ns part incl. sub-µs
                rows.append(("m", rng.choice(["a", "b"]), t, rng.random()))
        df = spark.createDataFrame(
            rows,
            "measurement string, field string, time_ns long, f_float double",
        )

        def model_bucket(t: int) -> int:
            local = t + _py_utc_off_ns(tz, t)
            return (local - offset_n) // every_n * every_n + offset_n

        got = window(df, every, offset=offset, tz=tz).select(
            "time_ns", "_start_ns", "_stop_ns"
        ).collect()
        for r in got:
            b = model_bucket(r["time_ns"])
            assert r["_start_ns"] == _py_local_to_instant_ns(tz, b), (tz, every, r)
            assert r["_stop_ns"] == _py_local_to_instant_ns(tz, b + every_n), (
                tz, every, r,
            )

        # aggregate_window + createEmpty: exact local-lattice window set
        lo_t = min(r[2] for r in rows)
        hi_t = max(r[2] for r in rows) + 1
        out = aggregate_window(
            df, every, "mean", by=["measurement", "field"],
            create_empty=True, range_start=lo_t, range_stop=hi_t,
            offset=offset, tz=tz,
        ).select("field", "_start_ns", "_stop_ns", "mean").collect()
        lo = lo_t + tz_offset_ns(tz, lo_t)
        hi = hi_t + tz_offset_ns(tz, hi_t)
        first_w = (lo - offset_n) // every_n * every_n + offset_n
        lattice = list(range(first_w, hi, every_n))
        from collections import defaultdict

        vals = defaultdict(list)
        for _, f, t, x in rows:
            vals[(f, model_bucket(t))].append(x)
        # key by (start, stop): in a spring-forward gap two lattice
        # buckets share a start instant (the gap bucket is zero-width)
        want = {}
        for f in ("a", "b"):
            for b in lattice:
                xs = vals.get((f, b))
                want[(
                    f,
                    _py_local_to_instant_ns(tz, b),
                    _py_local_to_instant_ns(tz, b + every_n),
                )] = sum(xs) / len(xs) if xs else None
        got_m = {
            (r["field"], r["_start_ns"], r["_stop_ns"]): r["mean"] for r in out
        }
        assert set(got_m) == set(want), (tz, every, "window set")
        for k, v in want.items():
            g = got_m[k]
            if v is None:
                assert g is None, (tz, every, k)
            else:
                assert abs(g - v) < 1e-9, (tz, every, k, g, v)


def test_influxql_tz_group_by_matches_zoneinfo_model(spark):
    """The InfluxQL tz() machinery (separate code path from the Flux
    location handling: frontends/influxql.py _ws local-domain
    bucketing) against the same independent zoneinfo model, across the
    Berlin 2024 spring-forward transition with fill(null) spine."""
    import random
    from collections import defaultdict

    from aws_greengrass_labs_database_influxdb_spark.frontends import execute_influxql

    tz = "Europe/Berlin"
    rng = random.Random(31)
    start_s, stop_s = 1711800000, 1711890000  # spans 2024-03-31 01:00Z jump
    rows = []
    for i in range(160):
        t = rng.randrange(start_s, stop_s) * 10**9 + rng.randrange(10**6) * 1000
        rows.append(
            ("events", rng.choice(["click", "view"]), t, float(i % 7))
        )
    df = spark.createDataFrame(
        [(m, et, t, x) for m, et, t, x in rows],
        "measurement string, event_type string, time_ns long, f_float double",
    ).withColumn("time", F.timestamp_micros(F.expr("time_ns div 1000"))).withColumn(
        "field", F.lit("value")
    )
    out = execute_influxql(
        df,
        f"SELECT mean(value) AS v FROM events "
        f"WHERE time >= {start_s}s AND time < {stop_s}s "
        f"GROUP BY time(1h), event_type fill(null) tz('{tz}')",
        tag_cols=("event_type",),
    ).collect()

    H = 3600 * 10**9
    lo = start_s * 10**9 + _py_utc_off_ns(tz, start_s * 10**9)
    hi = stop_s * 10**9 + _py_utc_off_ns(tz, stop_s * 10**9)
    lattice = list(range(lo // H * H, hi, H))
    vals = defaultdict(list)
    for _, et, t, x in rows:
        b = (t + _py_utc_off_ns(tz, t)) // H * H
        vals[(et, b)].append(x)
    want = defaultdict(int)
    for et in ("click", "view"):
        for b in lattice:
            xs = vals.get((et, b))
            m = round(sum(xs) / len(xs), 9) if xs else None
            want[(et, _py_local_to_instant_ns(tz, b), m)] += 1
    got = defaultdict(int)
    for r in out:
        t_ns = int(r["time"].replace(tzinfo=__import__("datetime").timezone.utc)
                   .timestamp()) * 10**9
        m = round(r["v"], 9) if r["v"] is not None else None
        got[(r["event_type"], t_ns, m)] += 1
    assert dict(got) == dict(want)
