"""Golden tests for the semantics where a naive Spark translation
silently diverges from InfluxDB (SURVEY.md §5.2(4), §7 hard parts):
selector tie-breaking, createEmpty, fill policies, per-series limit,
interpolation edges, EMA seeding, state runs, duration parsing.

Small hand-built frames with exact expected outputs.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

import aws_greengrass_labs_database_influxdb_spark.operators as ops
from aws_greengrass_labs_database_influxdb_spark.operators.windows import duration_ns


def mk(spark, rows):
    """rows: (series, time_ns, value, seq)"""
    return spark.createDataFrame(
        [(s, t, float(v), q) for s, t, v, q in rows],
        "series string, time_ns long, f_float double, ingest_seq long",
    )


S = 10**9  # 1s in ns


# ------------------------------------------------------------- tie breaking

def test_min_selector_tie_earliest_time_wins(spark):
    df = mk(spark, [("a", 5 * S, 1.0, 0), ("a", 2 * S, 1.0, 1), ("a", 7 * S, 3.0, 2)])
    out = ops.min_selector(df, by=["series"]).collect()
    assert len(out) == 1 and out[0].time_ns == 2 * S  # equal min values → earliest


def test_max_selector_tie_earliest_time_wins(spark):
    df = mk(spark, [("a", 5 * S, 9.0, 0), ("a", 2 * S, 9.0, 1), ("a", 1 * S, 3.0, 2)])
    out = ops.max_selector(df, by=["series"]).collect()
    assert out[0].time_ns == 2 * S


def test_first_last_same_timestamp_seq_breaks_tie(spark):
    df = mk(spark, [("a", 5 * S, 1.0, 7), ("a", 5 * S, 2.0, 3)])
    assert ops.first(df, by=["series"]).collect()[0].f_float == 2.0  # lower seq
    assert ops.last(df, by=["series"]).collect()[0].f_float == 1.0   # higher seq


def test_top_ties_resolved_by_time(spark):
    df = mk(spark, [("a", 3 * S, 5.0, 0), ("a", 1 * S, 5.0, 1), ("a", 2 * S, 4.0, 2)])
    out = ops.top(df, 2, by=["series"]).orderBy("time_ns").collect()
    assert [(r.time_ns, r.f_float) for r in out] == [(1 * S, 5.0), (3 * S, 5.0)]


# -------------------------------------------------------------- createEmpty

def test_aggregate_window_create_empty_emits_null_rows(spark):
    df = mk(spark, [("a", 0, 1.0, 0), ("a", 10 * S, 3.0, 1)])  # gap in the middle
    out = ops.aggregate_window(
        df, "5s", "mean", by=["series"], create_empty=True,
        range_start=0, range_stop=15 * S,
    ).orderBy("_start_ns")
    rows = out.collect()
    assert len(rows) == 3
    assert rows[0].mean == 1.0
    assert rows[1].mean is None  # empty window materialized as null
    assert rows[2].mean == 3.0
    # timeSrc defaults to _stop
    assert rows[0].time_ns == 5 * S


def test_aggregate_window_without_create_empty_skips_gaps(spark):
    df = mk(spark, [("a", 0, 1.0, 0), ("a", 10 * S, 3.0, 1)])
    out = ops.aggregate_window(df, "5s", "mean", by=["series"])
    assert out.count() == 2


def test_window_offset_shifts_alignment(spark):
    df = mk(spark, [("a", 7 * S, 1.0, 0)])
    w = ops.window(df, "5s", offset="2s")
    r = w.collect()[0]
    assert r._start_ns == 7 * S  # windows at 2,7,12... → 7 starts a window
    assert r._stop_ns == 12 * S


# ------------------------------------------------------------- fill family

def test_fill_previous_per_series_isolation(spark):
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, None), ("b", 1, None), ("b", 2, 5.0)],
        "series string, time_ns long, v double",
    )
    out = ops.fill(df, "v", use_previous=True, by=["series"], order="time_ns")
    got = {(r.series, r.time_ns): r.v for r in out.collect()}
    assert got[("a", 2)] == 1.0
    assert got[("b", 1)] is None  # no previous in THIS series — stays null


def test_interpolate_single_point_series_yields_exact_hits_only(spark):
    df = mk(spark, [("a", 5 * S, 2.0, 0)])
    out = ops.interpolate_linear(df, "5s", by=["series"], range_start=0, range_stop=20 * S)
    rows = out.collect()
    # only the grid point with a real observation (t=5s) survives —
    # nothing to interpolate toward on either side
    assert [(r.time_ns, r.f_float) for r in rows] == [(5 * S, 2.0)]


def test_interpolate_midpoint_exact(spark):
    df = mk(spark, [("a", 0, 0.0, 0), ("a", 10 * S, 10.0, 1)])
    out = ops.interpolate_linear(df, "5s", by=["series"], range_start=0, range_stop=11 * S)
    got = {r.time_ns: r.f_float for r in out.collect()}
    assert got[5 * S] == 5.0


def test_interpolate_omitted_bounds_is_lazy_and_matches_explicit(spark):
    """VERDICT r3 item 6: the bounds-omitted path must not run a
    driver-side pre-scan job at plan-construction time, and its result
    must equal the explicit-bounds run (out-of-range grid rows
    self-filter)."""
    df = mk(spark, [("a", 0, 0.0, 0), ("a", 10 * S, 10.0, 1),
                    ("b", 5 * S, 4.0, 2), ("b", 15 * S, 8.0, 3)])
    sc = spark.sparkContext
    before = set(sc.statusTracker().getJobIdsForGroup(None) or [])
    lazy = ops.interpolate_linear(df, "5s", by=["series"])  # plan only
    after = set(sc.statusTracker().getJobIdsForGroup(None) or [])
    assert after == before, "plan construction launched a Spark job (pre-scan)"
    explicit = ops.interpolate_linear(
        df, "5s", by=["series"], range_start=0, range_stop=16 * S
    )
    got_lazy = {(r.series, r.time_ns): r.f_float for r in lazy.collect()}
    got_explicit = {(r.series, r.time_ns): r.f_float for r in explicit.collect()}
    assert got_lazy == got_explicit


# ---------------------------------------------------------- per-series limit

def test_limit_is_per_series_not_global(spark):
    df = mk(spark, [(s, i * S, float(i), i) for s in ("a", "b") for i in range(5)])
    out = ops.limit(df, 2, by=["series"], order=["time_ns", "ingest_seq"])
    assert out.count() == 4  # 2 per series — a global limit would return 2
    tail = ops.tail(df, 1, by=["series"], order=["time_ns", "ingest_seq"])
    assert {r.time_ns for r in tail.collect()} == {4 * S}


# ----------------------------------------------------------------- EMA seed

def test_ema_seeds_with_sma_of_first_n(spark):
    df = mk(spark, [("a", i * S, v, i) for i, v in enumerate([2.0, 4.0, 6.0, 8.0])])
    out = ops.exponential_moving_average(df, 3, by=["series"]).orderBy("time_ns").collect()
    # stock emission (r15): the n−1 warm-up rows are dropped
    assert len(out) == 2
    assert out[0].ema == pytest.approx(4.0)  # SMA(2,4,6)
    k = 2 / (3 + 1)
    assert out[1].ema == pytest.approx(8.0 * k + 4.0 * (1 - k))


# ----------------------------------------------------------- Holt-Winters

def test_holt_winters_seasonal_matches_hand_computation(spark):
    """Triple smoothing (additive, α=β=γ=0.5), hand-computed: seasonal
    pattern of period 2 on a rising base."""
    vals = [10.0, 20.0, 12.0, 22.0, 14.0, 24.0]
    df = mk(spark, [("a", i * S, v, i) for i, v in enumerate(vals)])
    out = ops.holt_winters(df, 2, 1, seasonality=2, by=["series"]).orderBy("time_ns").collect()

    # hand recursion
    a = b = g = 0.5
    m1, m2 = (10 + 20) / 2, (12 + 22) / 2
    level, trend = m1, (m2 - m1) / 2
    seas = [10 - m1, 20 - m1]
    for t in range(2, 6):
        prev = level
        level = a * (vals[t] - seas[t % 2]) + (1 - a) * (level + trend)
        trend = b * (level - prev) + (1 - b) * trend
        seas[t % 2] = g * (vals[t] - level) + (1 - g) * seas[t % 2]
    exp = [level + (i + 1) * trend + seas[(6 + i) % 2] for i in range(2)]
    assert [r.hw for r in out] == pytest.approx(exp)
    assert [r.time_ns for r in out] == [6 * S, 7 * S]


def test_holt_winters_fit_beats_fixed_coefficients(spark):
    """fit=True (Nelder-Mead over α/β/γ, one-step-ahead SSE) must
    forecast a clean seasonal series at least as well as the fixed
    α=β=γ=0.5 path — measured as squared error against the series'
    true continuation."""
    import math

    period = 4
    series = [10.0 + 0.5 * i + 6.0 * math.sin(2 * math.pi * i / period)
              for i in range(44)]
    train, future = series[:36], series[36:]
    df = mk(spark, [("a", i * S, v, i) for i, v in enumerate(train)])
    fixed = ops.holt_winters(df, 8, 1, seasonality=period, by=["series"])
    fitted = ops.holt_winters(df, 8, 1, seasonality=period, by=["series"], fit=True)
    err_fixed = sum(
        (r.hw - f) ** 2
        for r, f in zip(fixed.orderBy("time_ns").collect(), future)
    )
    err_fit = sum(
        (r.hw - f) ** 2
        for r, f in zip(fitted.orderBy("time_ns").collect(), future)
    )
    assert err_fit < err_fixed


def test_holt_winters_fit_nonseasonal_runs(spark):
    vals = [10.0, 12.0, 14.0, 16.0, 18.0, 20.0]
    df = mk(spark, [("a", i * S, v, i) for i, v in enumerate(vals)])
    out = ops.holt_winters(df, 3, 1, by=["series"], fit=True).orderBy("time_ns").collect()
    # a perfect linear trend: any sane (α, β) forecasts the line
    assert [r.hw for r in out] == pytest.approx([22.0, 24.0, 26.0], abs=1e-6)


def test_holt_winters_seasonal_falls_back_without_two_seasons(spark):
    """< 2·s points → non-seasonal double smoothing (same as s=0)."""
    vals = [10.0, 20.0, 12.0]
    df = mk(spark, [("a", i * S, v, i) for i, v in enumerate(vals)])
    seasonal = ops.holt_winters(df, 2, 1, seasonality=2, by=["series"]).orderBy("time_ns").collect()
    plain = ops.holt_winters(df, 2, 1, seasonality=0, by=["series"]).orderBy("time_ns").collect()
    assert [r.hw for r in seasonal] == [r.hw for r in plain]


# ------------------------------------------------------------- state family

def test_state_count_runs_and_reset(spark):
    vals = [1.0, 5.0, 6.0, 1.0, 7.0]
    df = mk(spark, [("a", i * S, v, i) for i, v in enumerate(vals)])
    out = (
        ops.state_count(df, F.col("f_float") > 2, by=["series"])
        .orderBy("time_ns")
        .collect()
    )
    assert [r.state_count for r in out] == [-1, 1, 2, -1, 1]


def test_state_duration_seconds(spark):
    vals = [5.0, 6.0, 1.0, 7.0]
    df = mk(spark, [("a", i * S, v, i) for i, v in enumerate(vals)])
    out = (
        ops.state_duration(df, F.col("f_float") > 2, by=["series"])
        .orderBy("time_ns")
        .collect()
    )
    assert [r.state_duration for r in out] == [0, 1, -1, 0]


# ----------------------------------------------------------------- misc ops

def test_derivative_respects_units_and_drops_first(spark):
    df = mk(spark, [("a", 0, 0.0, 0), ("a", 2 * S, 10.0, 1)])
    out = ops.derivative(df, unit_seconds=1.0, by=["series"]).collect()
    assert len(out) == 1 and out[0].derivative == 5.0


def test_increase_handles_counter_reset(spark):
    vals = [10.0, 20.0, 5.0, 15.0]  # reset at 3rd point
    df = mk(spark, [("a", i * S, v, i) for i, v in enumerate(vals)])
    out = ops.increase(df, by=["series"]).orderBy("time_ns").collect()
    assert [r.increase for r in out] == [0.0, 10.0, 15.0, 25.0]


def test_histogram_zero_buckets_present(spark):
    df = mk(spark, [("a", 0, 5.0, 0)])
    h = ops.histogram(df, [1.0, 10.0], by=["series"]).orderBy("le").collect()
    assert [(r.le, r["count"]) for r in h] == [(1.0, 0), (10.0, 1)]


def test_spread_and_mode(spark):
    df = mk(spark, [("a", i * S, v, i) for i, v in enumerate([1.0, 9.0, 9.0, 2.0])])
    assert ops.spread(df, by=["series"]).collect()[0].spread == 8.0
    assert ops.mode_value(df, "f_float", by=["series"]).collect()[0].mode == 9.0


def test_unique_and_distinct(spark):
    df = mk(spark, [("a", i * S, v, i) for i, v in enumerate([1.0, 2.0, 2.0, 3.0])])
    assert {r.f_float for r in ops.unique(df, "f_float", by=["series"]).collect()} == {1.0, 3.0}
    assert ops.distinct_rows(df, "f_float", by=["series"]).count() == 3


def test_highest_max_keeps_whole_series(spark):
    df = mk(
        spark,
        [("a", 0, 1.0, 0), ("a", S, 9.0, 1), ("b", 0, 5.0, 2), ("c", 0, 2.0, 3)],
    )
    out = ops.highest_max(df, 2, series=["series"])
    assert {r.series for r in out.collect()} == {"a", "b"}
    assert out.count() == 3  # ALL rows of the kept series


# ------------------------------------------------------------ duration parse

@pytest.mark.parametrize(
    "tok,ns",
    [
        ("1m", 60 * S),
        ("30s", 30 * S),
        ("1h30m", 5400 * S),
        ("100ms", 100 * 10**6),
        ("2us", 2000),
        ("7ns", 7),
        ("1d", 86400 * S),
        ("1w", 7 * 86400 * S),
    ],
)
def test_duration_ns(tok, ns):
    assert duration_ns(tok) == ns


def test_session_window_gap_boundary(spark):
    """Sessionization semantics: an event exactly `gap` after the last
    one MERGES into the session (Spark session_window end-inclusive
    merge); one µs past the gap starts a new session. Session end =
    last event + gap."""
    import datetime as dt

    from aws_greengrass_labs_database_influxdb_spark.operators import session_window

    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        ("u", t0), ("u", t0 + 30 * m),            # exactly gap → merges
        ("u", t0 + 45 * m),                        # in-session
        ("u", t0 + 75 * m + dt.timedelta(microseconds=1)),  # past gap → new
    ]
    df = spark.createDataFrame(rows, "user string, time timestamp")
    out = sorted(
        session_window(df, "30m", by=("user",)).collect(),
        key=lambda r: r.session_start,
    )
    assert [r.n_events for r in out] == [3, 1]
    assert out[0].session_start == t0
    assert out[0].session_end == t0 + 75 * m
    assert out[1].session_start == t0 + 75 * m + dt.timedelta(microseconds=1)


# -------------------------------------------------- TRIX / hourSelection / TWA

def test_trix_matches_hand_ema_chain(spark):
    """TRIX(n=2) over a short ramp: hand-run the three EMA stages
    (SMA-seeded, k=2/3) and the final percent change."""
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0]
    df = mk(spark, [("a", i * S, v, i) for i, v in enumerate(vals)])
    out = ops.triple_exponential_derivative(df, 2, by=["series"]).orderBy("time_ns").collect()

    def ema(xs, n=2):
        k = 2.0 / (n + 1)
        e = sum(xs[:n]) / n
        res = [e]
        for x in xs[n:]:
            e = e + k * (x - e)
            res.append(e)
        return res

    e1 = ema(vals)            # len 6, starts at row 1
    e2 = ema(e1)              # len 5, starts at row 2
    e3 = ema(e2)              # len 4, starts at row 3
    expect = [(b - a) / a * 100.0 for a, b in zip(e3, e3[1:])]  # rows 4..6
    assert len(out) == len(expect)
    for row, want in zip(out, expect):
        assert row.trix == pytest.approx(want)


def test_hour_selection_inclusive_and_wrapped(spark):
    hour_ns = 3600 * S
    df = mk(spark, [("a", h * hour_ns, float(h), h) for h in range(24)])
    kept = {r.f_float for r in ops.hour_selection(df, 9, 17).collect()}
    assert kept == {float(h) for h in range(9, 18)}  # inclusive both ends
    wrapped = {r.f_float for r in ops.hour_selection(df, 22, 2).collect()}
    assert wrapped == {22.0, 23.0, 0.0, 1.0, 2.0}


def test_time_weighted_avg_weights_by_duration(spark):
    # value 0 for 10s then 10 for 90s: plain mean of points is misleading,
    # trapezoid TWA = (0+10)/2*10 + 10*90 over 100s = 9.5
    df = mk(spark, [("a", 0, 0.0, 0), ("a", 10 * S, 10.0, 1), ("a", 100 * S, 10.0, 2)])
    out = ops.time_weighted_avg(df, by=["series"]).collect()
    assert out[0].time_weighted_avg == pytest.approx(9.5)
    # single-point series: undefined (zero elapsed) → NULL
    one = mk(spark, [("b", 0, 5.0, 0)])
    assert ops.time_weighted_avg(one, by=["series"]).collect()[0].time_weighted_avg is None


def test_sample_random_mode_uniform_and_seed_deterministic(spark):
    """VERDICT r4 item 6: statistical validation of random SAMPLE.
    Fixed seeds make this fully deterministic: the chi-square statistic
    of per-row selection counts over a 120-seed sweep is a constant,
    asserted under the uniform null at alpha=0.001 (df=11 -> 31.26);
    and the same seed must reproduce the same selection."""
    from aws_greengrass_labs_database_influxdb_spark.operators import selectors as sel

    m = 12
    df = mk(spark, [("a", i * S, float(i), i) for i in range(m)]).coalesce(1).cache()
    df.count()
    counts = {i: 0 for i in range(m)}
    for seed in range(120):
        picked = sel.sample(df, 1, by=["series"], seed=seed).collect()
        assert len(picked) == 1
        counts[int(picked[0].f_float)] += 1
    exp = 120 / m
    chi2 = sum((c - exp) ** 2 / exp for c in counts.values())
    assert chi2 < 31.26, f"chi2={chi2:.2f} counts={counts}"
    # seeded determinism: same seed, same rows
    a = {r.time_ns for r in sel.sample(df, 3, by=["series"], seed=7).collect()}
    b = {r.time_ns for r in sel.sample(df, 3, by=["series"], seed=7).collect()}
    assert a == b and len(a) == 3


# ------------------------------------------------------- calendar windows

def _dns(y, mo, d=1):
    import datetime as dt

    return int(
        dt.datetime(y, mo, d, tzinfo=dt.timezone.utc).timestamp()
    ) * S


def test_duration_parts_calendar_units():
    from aws_greengrass_labs_database_influxdb_spark.operators.windows import duration_parts

    assert duration_parts("1mo") == (1, 0)
    assert duration_parts("-2y") == (-24, 0)
    assert duration_parts("1mo10d") == (1, 10 * 86400 * S)
    assert duration_parts("90m") == (0, 90 * 60 * S)
    assert duration_parts(7) == (0, 7)


def test_calendar_window_bounds_leap_february(spark):
    df = mk(spark, [("a", _dns(2024, 2, 15), 1.0, 0)])
    r = ops.window(df, "1mo").collect()[0]
    assert r._start_ns == _dns(2024, 2, 1)
    assert r._stop_ns == _dns(2024, 3, 1)  # 29-day window, not fixed-width


def test_calendar_window_quarterly_with_month_offset(spark):
    # every: 3mo, offset: 1mo → windows start Feb/May/Aug/Nov
    df = mk(spark, [("a", _dns(2024, 4, 10), 1.0, 0)])
    r = ops.window(df, "3mo", offset="1mo").collect()[0]
    assert r._start_ns == _dns(2024, 2, 1)
    assert r._stop_ns == _dns(2024, 5, 1)


def test_aggregate_window_calendar_create_empty(spark):
    df = mk(spark, [("a", _dns(2024, 1, 10), 2.0, 0),
                    ("a", _dns(2024, 3, 20), 4.0, 1)])
    out = ops.aggregate_window(
        df, "1mo", "mean", by=["series"], create_empty=True,
        range_start=_dns(2023, 12, 1), range_stop=_dns(2024, 4, 1),
    ).orderBy("_start_ns")
    rows = out.collect()
    assert [r._start_ns for r in rows] == [
        _dns(2023, 12, 1), _dns(2024, 1, 1), _dns(2024, 2, 1), _dns(2024, 3, 1)
    ]
    assert [r.mean for r in rows] == [None, 2.0, None, 4.0]
    # _stop is the NEXT calendar month, not start + 30d
    assert rows[0]._stop_ns == _dns(2024, 1, 1)
    assert rows[3]._stop_ns == _dns(2024, 4, 1)


def test_time_shift_calendar_month_clamps_day(spark):
    from aws_greengrass_labs_database_influxdb_spark.operators.core import time_shift

    df = spark.createDataFrame(
        [(1,)], "id int"
    ).select(F.lit("2024-01-31 12:00:00").cast("timestamp").alias("time"))
    r = time_shift(df, "1mo").collect()[0]
    assert str(r.time) == "2024-02-29 12:00:00"  # leap-year clamp


def test_calendar_window_mixed_offset_shifts_lattice(spark):
    """r13 fuzzer: a fixed-duration offset on a calendar window raised
    a raw ValueError; stock accepts mixed offsets — the month part
    shifts the month lattice, the fixed part shifts every boundary, so
    `every: 1mo, offset: 1d` windows run from the 2nd 00:00 of each
    month. Spine (createEmpty), window() bounds, and the aggregate
    bucket all share the shifted lattice."""
    import datetime as dt

    from aws_greengrass_labs_database_influxdb_spark.operators.windows import aggregate_window

    def ns(y, m, d, h=0):
        return int(dt.datetime(
            y, m, d, h, tzinfo=dt.timezone.utc).timestamp() * 1e9)

    rows = [("s", ns(2024, 1, 1, 12), 1.0),  # -> [Dec 2, Jan 2)
            ("s", ns(2024, 1, 5), 2.0),      # -> [Jan 2, Feb 2)
            ("s", ns(2024, 2, 10), 4.0)]     # -> [Feb 2, Mar 2)
    df = spark.createDataFrame(
        rows, "series string, time_ns long, f_float double")
    out = aggregate_window(
        df, "1mo", "sum", by=("series",), offset=86400 * 10**9,
    ).orderBy("_start_ns").collect()
    got = [
        (dt.datetime.fromtimestamp(
            r["_start_ns"] / 1e9, dt.timezone.utc).strftime("%Y-%m-%d"),
         r["sum"])
        for r in out
    ]
    assert got == [("2023-12-02", 1.0), ("2024-01-02", 2.0),
                   ("2024-02-02", 4.0)]

    # createEmpty spine shares the shifted lattice (no dropped rows,
    # empty windows emitted between the occupied ones)
    out = aggregate_window(
        df, "1mo", "sum", by=("series",), offset="1d",
        create_empty=True, range_start=ns(2023, 12, 15),
        range_stop=ns(2024, 3, 1),
    ).orderBy("_start_ns").collect()
    assert [r["sum"] for r in out] == [1.0, 2.0, 4.0]
    assert len(out) == 3
