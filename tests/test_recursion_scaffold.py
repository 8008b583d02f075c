"""Focused tests for the r15 mapInPandas recursion scaffold
(operators/analytics._per_series_pandas).

The r15 optimization replaced groupBy().applyInPandas (one Arrow batch
+ one Python call per group) with mapInPandas over a series-hash
repartition (one task folds many series). These pin the scaffold's
edge cases directly, independent of the oracle suite:

- a series whose partition arrives as MULTIPLE Arrow batches must be
  concatenated before the fold (a split series would restart the
  recursion mid-stream);
- many series in one partition must each fold independently with the
  (time_ns, ingest_seq) total order;
- NULL group keys form their own group (old groupBy semantics);
- an empty ``by`` folds the whole frame as one global series.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _mk_points(spark, n_series: int, n_rows: int):
    """Interleaved rows: series s0..s{k-1}, times striped so input
    order is NOT series-contiguous (the scaffold must sort)."""
    rows = []
    seq = 0
    for t in range(n_rows):
        for s in range(n_series):
            rows.append((f"s{s}", t * 1000 + s, float(s * 1000 + t), seq))
            seq += 1
    return spark.createDataFrame(
        rows, "series string, time_ns long, f_float double, ingest_seq long"
    )


def _ema_ref(vals, n):
    """Reference EMA (same contract as operators.analytics.ema_values):
    seed = SMA of the first n, then the recursive fold; warm-ups NaN."""
    out = [float("nan")] * len(vals)
    if len(vals) < n:
        return out
    k = 2.0 / (n + 1)
    e = sum(vals[:n]) / float(n)
    out[n - 1] = e
    for i in range(n, len(vals)):
        e = e + k * (vals[i] - e)
        out[i] = e
    return out


def test_series_split_across_arrow_batches(spark):
    """One series larger than the Arrow batch size arrives at the
    Python worker as several batches; the fold must span them all
    (concat-before-sort), not restart per batch."""
    from aws_greengrass_labs_database_influxdb_spark.operators.analytics import (
        exponential_moving_average,
    )

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "50")
    try:
        df = _mk_points(spark, n_series=3, n_rows=400)  # 1200 rows ≫ 50
        out = (
            exponential_moving_average(df, 10, by=("series",))
            .orderBy("series", "time_ns")
            .collect()
        )
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    # emission contract: n-1 warm-ups dropped per series
    by_series = {}
    for r in out:
        by_series.setdefault(r["series"], []).append(r["ema"])
    assert set(by_series) == {"s0", "s1", "s2"}
    for s in range(3):
        vals = [float(s * 1000 + t) for t in range(400)]
        ref = [v for v in _ema_ref(vals, 10) if v == v]  # drop NaN
        got = by_series[f"s{s}"]
        assert len(got) == len(ref) == 391
        assert got == pytest.approx(ref, abs=0.0)  # bit-path identical fold


def test_many_series_one_partition_and_tie_break(spark):
    """Several series hash into the same partition; each folds
    independently, and equal timestamps order by ingest_seq."""
    from aws_greengrass_labs_database_influxdb_spark.operators.analytics import (
        exponential_moving_average,
    )

    rows = [
        # series a: two rows share time_ns=5; seq decides the order
        ("a", 1, 1.0, 10), ("a", 5, 3.0, 12), ("a", 5, 2.0, 11),
        ("b", 1, 10.0, 20), ("b", 2, 20.0, 21), ("b", 3, 30.0, 22),
    ]
    df = spark.createDataFrame(
        rows, "series string, time_ns long, f_float double, ingest_seq long"
    )
    out = exponential_moving_average(df, 2, by=("series",))
    got = {(r["series"], r["ingest_seq"]): r["ema"] for r in out.collect()}
    # series a sorted by (time_ns, seq): values 1.0, 2.0, 3.0
    ref_a = _ema_ref([1.0, 2.0, 3.0], 2)
    assert got[("a", 11)] == pytest.approx(ref_a[1], abs=0.0)
    assert got[("a", 12)] == pytest.approx(ref_a[2], abs=0.0)
    ref_b = _ema_ref([10.0, 20.0, 30.0], 2)
    assert got[("b", 21)] == pytest.approx(ref_b[1], abs=0.0)
    assert got[("b", 22)] == pytest.approx(ref_b[2], abs=0.0)


def test_null_group_key_is_its_own_group(spark):
    """A NULL series key groups like Spark groupBy: its rows fold
    together, separate from every named series."""
    from aws_greengrass_labs_database_influxdb_spark.operators.analytics import (
        exponential_moving_average,
    )

    rows = [
        (None, 1, 1.0, 1), (None, 2, 2.0, 2), (None, 3, 3.0, 3),
        ("x", 1, 5.0, 4), ("x", 2, 6.0, 5),
    ]
    df = spark.createDataFrame(
        rows, "series string, time_ns long, f_float double, ingest_seq long"
    )
    out = exponential_moving_average(df, 2, by=("series",)).collect()
    nulls = sorted(r["ema"] for r in out if r["series"] is None)
    xs = [r["ema"] for r in out if r["series"] == "x"]
    ref_null = [v for v in _ema_ref([1.0, 2.0, 3.0], 2) if v == v]
    assert nulls == pytest.approx(sorted(ref_null), abs=0.0)
    assert xs == pytest.approx([v for v in _ema_ref([5.0, 6.0], 2) if v == v],
                               abs=0.0)


def test_empty_by_folds_one_global_series(spark):
    """by=() matches the old groupBy() shape: one global group."""
    from pyspark.sql import types as T

    from aws_greengrass_labs_database_influxdb_spark.operators.analytics import (
        _per_series_pandas,
    )

    df = spark.createDataFrame(
        [(i, float(i), i) for i in range(20)],
        "time_ns long, f_float double, ingest_seq long",
    )

    def _cumsum(pdf: pd.DataFrame) -> pd.Series:
        return pdf["f_float"].cumsum()

    out = _per_series_pandas(
        df, (), "time_ns", "acc", T.DoubleType(), _cumsum, needed=("f_float",)
    ).orderBy("time_ns").collect()
    assert [r["acc"] for r in out] == pytest.approx(
        [sum(range(i + 1)) for i in range(20)], abs=0.0
    )
