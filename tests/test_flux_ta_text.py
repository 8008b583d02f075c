"""Technical-indicator family THROUGH THE FLUX TEXT FRONTEND — value
assertions, not count()>0 smoke (r15, VERDICT r14 #1).

Stock Flux replaces ``_value`` with the indicator; the r14 dispatch
arm left the raw series in ``_value`` (result in a side column), so
``relativeStrengthIndex(n:) |> mean()`` silently averaged the RAW
values and ``doubleEMA(n:) |> mean()`` raised "unknown column
'f_float'". Every test here pipes an indicator into a consumer
(mean/last/filter) and asserts the VALUE, plus the stock emission
counts (warm-up rows dropped; difference keepFirst/initialZero).

Expected values come from the operators' pure-Python folds
(ema_values/rsi_values/kama_values, ``native=False`` — bit-identical
to the kernels, pinned against hand goldens in
test_analytics_native/test_operators_golden) or hand arithmetic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from aws_greengrass_labs_database_influxdb_spark.frontends.flux import execute_flux
from aws_greengrass_labs_database_influxdb_spark.operators.analytics import (
    ema_values,
    kama_values,
    rsi_values,
)
from aws_greengrass_labs_database_influxdb_spark.schema import POINTS_SCHEMA
from aws_greengrass_labs_database_influxdb_spark.sources.lineprotocol import parse_lines

T0 = 1_600_000_000_000_000_000
VALS = [10.0, 12.0, 11.0, 14.0, 13.0, 16.0, 15.0, 18.0, 17.0, 20.0]


def _pts(spark, vals=VALS):
    lines = [f"m,host=a f={v} {T0 + i * 10**9}" for i, v in enumerate(vals)]
    pdf = pd.DataFrame(parse_lines(lines))
    pdf["time"] = pd.to_datetime(pdf["time_ns"] // 1000, unit="us")
    return spark.createDataFrame(
        pdf[[f.name for f in POINTS_SCHEMA.fields]], POINTS_SCHEMA
    )


@pytest.fixture(scope="module")
def tapts(spark):
    return _pts(spark).cache()


def _one_value(df):
    rows = df.collect()
    assert len(rows) == 1, rows
    return rows[0][len(rows[0]) - 1]  # the aggregate's value column is last


def _values(df):
    return [r.f_float for r in df.orderBy("time_ns").collect()]


# ------------------------------------------------------------ promotion

def test_rsi_promotes_and_mean_averages_rsi(spark, tapts):
    exp = rsi_values(np.array(VALS), 3, native=False)
    exp_rows = [x for x in exp if not np.isnan(x)]
    out = execute_flux(
        tapts, 'from(bucket:"b") |> relativeStrengthIndex(n: 3)'
    )
    assert _values(out) == pytest.approx(exp_rows)  # 7 rows: warm-up dropped
    got = _one_value(
        execute_flux(
            tapts, 'from(bucket:"b") |> relativeStrengthIndex(n: 3) |> mean()'
        )
    )
    assert got == pytest.approx(float(np.mean(exp_rows)))
    # the raw mean (the r14 wrong answer) must NOT come back
    assert got != pytest.approx(float(np.mean(VALS)))


def test_rsi_filter_reads_indicator(tapts):
    exp = [x for x in rsi_values(np.array(VALS), 3, native=False) if not np.isnan(x)]
    out = execute_flux(
        tapts,
        'from(bucket:"b") |> relativeStrengthIndex(n: 3)'
        " |> filter(fn: (r) => r._value > 60.0)",
    )
    assert _values(out) == pytest.approx([x for x in exp if x > 60.0])


def test_kama_promotes_last_and_emission(tapts):
    exp = kama_values(np.array(VALS), 3, native=False)
    exp_rows = [x for x in exp if not np.isnan(x)]
    assert len(exp_rows) == len(VALS) - 3  # seed row not emitted
    out = execute_flux(tapts, 'from(bucket:"b") |> kaufmansAMA(n: 3)')
    assert "kama" not in out.columns
    assert _values(out) == pytest.approx(exp_rows)
    got = _one_value(
        execute_flux(tapts, 'from(bucket:"b") |> kaufmansAMA(n: 3) |> last()')
    )
    assert got == pytest.approx(exp_rows[-1])


def test_kaufmans_er_promotes(tapts):
    out = execute_flux(tapts, 'from(bucket:"b") |> kaufmansER(n: 3)')
    assert "ker" not in out.columns and out.count() == len(VALS) - 3
    # hand value for the first emitted row (i=3): |14-10| / (2+1+3)
    assert _values(out)[0] == pytest.approx(4.0 / 6.0)


def test_cmo_promotes(tapts):
    out = execute_flux(
        tapts, 'from(bucket:"b") |> chandeMomentumOscillator(n: 3)'
    )
    assert "cmo" not in out.columns and out.count() == len(VALS) - 3
    # i=3: deltas (2, -1, 3): up 5, down 1 → 100·(4/6)
    assert _values(out)[0] == pytest.approx(100.0 * 4.0 / 6.0)
    d = np.diff(VALS)
    exp = [
        100.0
        * (d[i - 2 : i + 1][d[i - 2 : i + 1] > 0].sum()
           - (-d[i - 2 : i + 1][d[i - 2 : i + 1] < 0]).sum())
        / np.abs(d[i - 2 : i + 1]).sum()
        for i in range(2, len(d))
    ]
    got = _one_value(
        execute_flux(
            tapts,
            'from(bucket:"b") |> chandeMomentumOscillator(n: 3) |> mean()',
        )
    )
    assert got == pytest.approx(float(np.mean(exp)))


def _ema_chain(vals, n, depth):
    cur = np.asarray(vals, dtype=float)
    outs = []
    for _ in range(depth):
        cur = ema_values(cur, n, native=False)
        cur = cur[~np.isnan(cur)]
        outs.append(cur)
    return outs


def test_double_ema_mean_computes(tapts):
    e1, e2 = _ema_chain(VALS, 3, 2)
    dema = 2 * e1[len(e1) - len(e2):] - e2
    got = _one_value(
        execute_flux(tapts, 'from(bucket:"b") |> doubleEMA(n: 3) |> mean()')
    )
    assert got == pytest.approx(float(np.mean(dema)))


def test_triple_ema_mean_computes(tapts):
    e1, e2, e3 = _ema_chain(VALS, 3, 3)
    a1 = e1[len(e1) - len(e3):]
    a2 = e2[len(e2) - len(e3):]
    tema = 3 * a1 - 3 * a2 + e3
    got = _one_value(
        execute_flux(tapts, 'from(bucket:"b") |> tripleEMA(n: 3) |> mean()')
    )
    assert got == pytest.approx(float(np.mean(tema)))


def test_trix_promotes_and_computes(tapts):
    (e3,) = [_ema_chain(VALS, 3, 3)[2]]
    trix = (e3[1:] - e3[:-1]) / e3[:-1] * 100.0
    out = execute_flux(
        tapts, 'from(bucket:"b") |> tripleExponentialDerivative(n: 3)'
    )
    assert "trix" not in out.columns
    assert _values(out) == pytest.approx(list(trix))
    got = _one_value(
        execute_flux(
            tapts,
            'from(bucket:"b") |> tripleExponentialDerivative(n: 3) |> mean()',
        )
    )
    assert got == pytest.approx(float(np.mean(trix)))


def test_holt_winters_promotes_and_mean(tapts):
    # fixed α=β=0.5 Holt recursion, hand fold
    level, trend = VALS[0], VALS[1] - VALS[0]
    for x in VALS[1:]:
        prev = level
        level = 0.5 * x + 0.5 * (level + trend)
        trend = 0.5 * (level - prev) + 0.5 * trend
    fc = [level + (i + 1) * trend for i in range(3)]
    out = execute_flux(
        tapts, 'from(bucket:"b") |> holtWinters(n: 3, interval: 1s)'
    )
    assert "hw" not in out.columns
    assert sorted(_values(out)) == pytest.approx(sorted(fc))
    got = _one_value(
        execute_flux(
            tapts,
            'from(bucket:"b") |> holtWinters(n: 3, interval: 1s) |> mean()',
        )
    )
    assert got == pytest.approx(float(np.mean(fc)))


# ----------------------------------------------------- emission contracts

def test_ema_drops_warmup_rows(spark):
    pts = _pts(spark, [2.0, 4.0, 6.0, 8.0, 10.0])
    out = execute_flux(
        pts, 'from(bucket:"b") |> exponentialMovingAverage(n: 3)'
    )
    vals = _values(out)
    assert len(vals) == 3  # 5 − (3 − 1): stock drops the warm-up rows
    assert vals[0] == pytest.approx(4.0)  # SMA seed
    assert None not in vals


def test_difference_default_drops_first_row(spark):
    pts = _pts(spark, [5.0, 3.0, 7.0, 7.0])
    out = execute_flux(pts, 'from(bucket:"b") |> difference()')
    assert _values(out) == pytest.approx([-2.0, 4.0, 0.0])


def test_difference_keep_first_keeps_null_row(spark):
    pts = _pts(spark, [5.0, 3.0, 7.0])
    out = execute_flux(
        pts, 'from(bucket:"b") |> difference(keepFirst: true)'
    )
    vals = _values(out)
    assert len(vals) == 3 and vals[0] is None
    assert vals[1:] == pytest.approx([-2.0, 4.0])


def test_difference_non_negative_null_vs_initial_zero(spark):
    pts = _pts(spark, [5.0, 3.0, 7.0])
    nn = _values(
        execute_flux(pts, 'from(bucket:"b") |> difference(nonNegative: true)')
    )
    assert nn[0] is None and nn[1] == pytest.approx(4.0)
    iz = _values(
        execute_flux(
            pts,
            'from(bucket:"b") |> difference(nonNegative: true, initialZero: true)',
        )
    )
    # decreasing step diffs against 0 → the current value (stock)
    assert iz == pytest.approx([3.0, 4.0])


def test_difference_mean_consumes_differences(spark, tapts):
    diffs = np.diff(VALS)
    got = _one_value(
        execute_flux(tapts, 'from(bucket:"b") |> difference() |> mean()')
    )
    assert got == pytest.approx(float(np.mean(diffs)))
