"""union() of differently-bounded branches spines PER BRANCH (r15,
VERDICT r14 #2): stock Flux carries _start/_stop per table, so
``union(tables: [a, b]) |> aggregateWindow(createEmpty: true)`` spines
each table to its OWN stop. The merged-interval approximation gave the
shorter branch null windows from the longer sibling's tail.

Mechanism under test: Pipeline.union stamps literal
``_rb_start_ns``/``_rb_stop_ns`` columns when branch bounds differ;
aggregate_window groups per branch and clips the merged-lattice spine
to each branch's carried interval.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from aws_greengrass_labs_database_influxdb_spark.frontends import FluxError
from aws_greengrass_labs_database_influxdb_spark.frontends.flux import execute_flux
from aws_greengrass_labs_database_influxdb_spark.schema import POINTS_SCHEMA
from aws_greengrass_labs_database_influxdb_spark.sources.lineprotocol import parse_lines

# 2024-01-01T00:00:00Z
T0 = 1_704_067_200 * 10**9
M = 60 * 10**9


@pytest.fixture(scope="module")
def upts(spark):
    """temp: data only in the first 20 min; press: data across 2 h."""
    lines = [
        f"temp,host=a f={10.0 + i} {T0 + i * 10 * M}" for i in range(3)
    ] + [
        f"press,host=a f={100.0 + i} {T0 + i * 20 * M}" for i in range(6)
    ]
    pdf = pd.DataFrame(parse_lines(lines))
    pdf["time"] = pd.to_datetime(pdf["time_ns"] // 1000, unit="us")
    return spark.createDataFrame(
        pdf[[f.name for f in POINTS_SCHEMA.fields]], POINTS_SCHEMA
    ).cache()


UNION_SCRIPT = (
    'a = from(bucket:"b")'
    " |> range(start: 2024-01-01T00:00:00Z, stop: 2024-01-01T01:00:00Z)"
    ' |> filter(fn: (r) => r._measurement == "temp")\n'
    'b = from(bucket:"b")'
    " |> range(start: 2024-01-01T00:00:00Z, stop: 2024-01-01T03:00:00Z)"
    ' |> filter(fn: (r) => r._measurement == "press")\n'
    "union(tables: [a, b])"
)


def test_union_spines_each_branch_to_its_own_stop(upts):
    out = execute_flux(
        upts,
        UNION_SCRIPT
        + " |> aggregateWindow(every: 30m, fn: mean, createEmpty: true)",
    ).collect()
    per = {}
    for r in out:
        per.setdefault(r.measurement, []).append(r)
    # temp spines to ITS 1h stop (2×30m), not the merged 3h (6×30m)
    assert len(per["temp"]) == 2
    assert len(per["press"]) == 6
    temp = sorted(per["temp"], key=lambda r: r.time_ns)
    assert [r.time_ns for r in temp] == [T0 + 30 * M, T0 + 60 * M]
    assert temp[0].f_float == pytest.approx((10.0 + 11.0 + 12.0) / 3)
    assert temp[1].f_float is None  # its own empty window stays
    press = sorted(per["press"], key=lambda r: r.time_ns)
    assert press[-1].time_ns == T0 + 180 * M
    assert press[-1].f_float is None  # 2h..3h windows empty but spined


def test_union_branch_bounds_are_internal_columns(upts):
    out = execute_flux(
        upts,
        UNION_SCRIPT
        + " |> aggregateWindow(every: 30m, fn: mean, createEmpty: true)",
    )
    assert "_rb_start_ns" not in out.columns
    assert "_rb_stop_ns" not in out.columns
    # group(mode: except) never pulls the carriers into the key
    out2 = execute_flux(
        upts,
        UNION_SCRIPT + ' |> group(columns: ["host"], mode: "except")'
        " |> count()",
    )
    assert "_rb_start_ns" not in out2.columns


def test_union_same_bounds_does_not_stamp(upts):
    same = (
        'a = from(bucket:"b")'
        " |> range(start: 2024-01-01T00:00:00Z, stop: 2024-01-01T01:00:00Z)"
        ' |> filter(fn: (r) => r._measurement == "temp")\n'
        'b = from(bucket:"b")'
        " |> range(start: 2024-01-01T00:00:00Z, stop: 2024-01-01T01:00:00Z)"
        ' |> filter(fn: (r) => r._measurement == "press")\n'
        "union(tables: [a, b])"
    )
    out = execute_flux(upts, same)
    assert "_rb_start_ns" not in out.columns  # zero-cost on the common shape


def test_union_unbounded_branch_still_fails_loud(upts):
    script = (
        'a = from(bucket:"b")'
        " |> range(start: 2024-01-01T00:00:00Z, stop: 2024-01-01T01:00:00Z)"
        ' |> filter(fn: (r) => r._measurement == "temp")\n'
        'b = from(bucket:"b") |> filter(fn: (r) => r._measurement == "press")\n'
        "union(tables: [a, b])"
        " |> aggregateWindow(every: 30m, fn: mean, createEmpty: true)"
    )
    with pytest.raises(FluxError, match="bounded range"):
        execute_flux(upts, script)


def test_union_timeshift_branch_keeps_per_branch_spine(upts):
    """timeShift after union moves both branches' carried bounds is NOT
    claimed — shift before union: the shifted branch's bounds ride its
    Pipeline, so the stamped carriers reflect the shift."""
    script = (
        'a = from(bucket:"b")'
        " |> range(start: 2024-01-01T00:00:00Z, stop: 2024-01-01T01:00:00Z)"
        ' |> filter(fn: (r) => r._measurement == "temp")'
        " |> timeShift(duration: 1h)\n"
        'b = from(bucket:"b")'
        " |> range(start: 2024-01-01T00:00:00Z, stop: 2024-01-01T03:00:00Z)"
        ' |> filter(fn: (r) => r._measurement == "press")\n'
        "union(tables: [a, b])"
        " |> aggregateWindow(every: 30m, fn: mean, createEmpty: true)"
    )
    out = execute_flux(upts, script).collect()
    temp = sorted((r for r in out if r.measurement == "temp"),
                  key=lambda r: r.time_ns)
    assert [r.time_ns for r in temp] == [T0 + 90 * M, T0 + 120 * M]


def test_union_three_branches_each_spine_to_own_stop(upts):
    script = (
        'a = from(bucket:"b")'
        " |> range(start: 2024-01-01T00:00:00Z, stop: 2024-01-01T00:30:00Z)"
        ' |> filter(fn: (r) => r._measurement == "temp")\n'
        'b = from(bucket:"b")'
        " |> range(start: 2024-01-01T00:00:00Z, stop: 2024-01-01T01:00:00Z)"
        ' |> filter(fn: (r) => r._measurement == "press")\n'
        'c = from(bucket:"b")'
        " |> range(start: 2024-01-01T01:00:00Z, stop: 2024-01-01T02:00:00Z)"
        ' |> filter(fn: (r) => r._measurement == "press")\n'
        "union(tables: [a, b, c])"
        " |> aggregateWindow(every: 30m, fn: count, createEmpty: true)"
    )
    out = execute_flux(upts, script).collect()
    per = {}
    for r in out:
        per.setdefault(r.measurement, []).append(r.time_ns)
    assert sorted(per["temp"]) == [T0 + 30 * M]
    # press appears in b (2 windows) and c (2 windows) — stock: two
    # tables, each spined to its own interval
    assert sorted(per["press"]) == [
        T0 + 30 * M, T0 + 60 * M, T0 + 90 * M, T0 + 120 * M
    ]
