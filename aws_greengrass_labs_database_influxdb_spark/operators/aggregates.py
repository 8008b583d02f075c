"""Aggregate operators (SURVEY.md §2.2.4).

Flux aggregates collapse each table (group key) to one row. Here: a
``groupBy(by).agg(...)`` — map-side partial aggregation and AQE come
free from Spark. ``AGG_FNS`` is the registry the pipeline builder and
``aggregate_window`` share.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F
from .errors import OperatorValidationError


def _spread(c: Column) -> Column:
    return F.max(c) - F.min(c)


AGG_FNS: dict[str, callable] = {
    "count": F.count,
    "sum": F.sum,
    "mean": F.avg,
    "min": F.min,
    "max": F.max,
    "stddev": F.stddev,  # sample stddev — matches Flux/InfluxQL STDDEV
    "skew": F.skewness,
    "spread": _spread,
    "median": lambda c: F.median(c),  # exact; Flux default is estimate
    "mode": lambda c: F.mode(c),
    "first": F.first,
    "last": F.last,
    "count_distinct": F.countDistinct,
    "approx_count_distinct": F.approx_count_distinct,
}


def quantile(
    df: DataFrame,
    q: float,
    method: str = "estimate_tdigest",
    column: str = "f_float",
    by: Sequence[str] = ("measurement", "field"),
    alias: str = "quantile",
) -> DataFrame:
    """Flux ``quantile(q:, method:)`` / InfluxQL PERCENTILE.

    - ``estimate_tdigest``: approximate (Spark's percentile_approx — a
      quantile sketch, the scale path, mergeable map-side);
    - ``exact_mean``: exact interpolated percentile;
    - ``exact_selector``: the actual data point at rank ⌈q·n⌉
      (selector semantics — returns a value that exists in the data).
    """
    from pyspark.sql import Window as W

    c = F.col(column)
    if method == "estimate_tdigest":
        return df.groupBy(*by).agg(F.percentile_approx(c, q).alias(alias))
    if method == "exact_mean":
        return df.groupBy(*by).agg(F.percentile(c, q).alias(alias))
    if method == "exact_selector":
        w = W.partitionBy(*by).orderBy(column)
        wn = W.partitionBy(*by)
        ranked = df.withColumn("_rk", F.row_number().over(w)).withColumn(
            "_n", F.count(F.lit(1)).over(wn)
        )
        target = F.greatest(F.lit(1), F.ceil(F.lit(q) * F.col("_n")))
        return (
            ranked.filter(F.col("_rk") == target)
            .select(*by, c.alias(alias))
        )
    raise OperatorValidationError(f"unknown quantile method {method!r}")


def aggregate(
    df: DataFrame,
    fn: str,
    column: str = "f_float",
    by: Sequence[str] = ("measurement", "field"),
    alias: str | None = None,
) -> DataFrame:
    """Apply one named Flux aggregate per group key."""
    agg_col = AGG_FNS[fn](F.col(column)).alias(alias or fn)
    return df.groupBy(*by).agg(agg_col)


def spread(df: DataFrame, column: str = "f_float", by: Sequence[str] = ()) -> DataFrame:
    """Flux ``spread()`` / InfluxQL SPREAD: max − min per table."""
    return df.groupBy(*by).agg(_spread(F.col(column)).alias("spread"))


def mode_value(df: DataFrame, column: str, by: Sequence[str] = ()) -> DataFrame:
    """Flux ``mode()``: most frequent value (ties → smallest, per docs).

    Implemented as count-per-value + ``max_by`` over (count, -value) so
    the tie rule is explicit and engine-independent (Spark's ``F.mode``
    tie-breaking is unspecified).
    """
    counts = df.groupBy(*by, column).agg(F.count(F.lit(1)).alias("_n"))
    # max count, then min value among ties
    w_keys = [F.col(c) for c in by]
    ranked = counts.groupBy(*w_keys).agg(
        F.min_by(
            F.col(column),
            F.struct((-F.col("_n")).alias("neg_n"), F.col(column).alias("v")),
        ).alias("mode")
    )
    return ranked


def integral(
    df: DataFrame,
    unit_seconds: float = 1.0,
    value: str = "f_float",
    time_ns: str = "time_ns",
    by: Sequence[str] = ("measurement", "field"),
) -> DataFrame:
    """Flux ``integral(unit:)`` / InfluxQL INTEGRAL.

    Trapezoidal area under the curve per unit time, per series:
    sum over consecutive pairs of (v + v_prev)/2 * Δt_unit. Window-lag
    per series then a plain sum — one shuffle on the series key.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(*by).orderBy(time_ns)
    prev_v = F.lag(value).over(w)
    prev_t = F.lag(time_ns).over(w)
    area = (F.col(value) + prev_v) / 2.0 * ((F.col(time_ns) - prev_t) / 1e9 / unit_seconds)
    return (
        df.withColumn("_area", area)
        .groupBy(*by)
        .agg(F.sum("_area").alias("integral"))
    )


def time_weighted_avg(
    df: DataFrame,
    value: str = "f_float",
    time_ns: str = "time_ns",
    by: Sequence[str] = ("measurement", "field"),
    alias: str = "time_weighted_avg",
) -> DataFrame:
    """Flux ``timeWeightedAvg(unit:)`` — trapezoid integral over the
    table divided by the table's total elapsed time (the ``unit``
    cancels between numerator and denominator, so the result is
    unit-free). Same one-shuffle shape as :func:`integral`: a lag
    window per series, then a single hash aggregate with map-side
    partials. Series with a single point yield NULL (zero elapsed).
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(*by).orderBy(time_ns)
    prev_v = F.lag(value).over(w)
    prev_t = F.lag(time_ns).over(w)
    area = (F.col(value) + prev_v) / 2.0 * ((F.col(time_ns) - prev_t) / 1e9)
    span = (F.max(time_ns) - F.min(time_ns)) / F.lit(1e9)
    return (
        df.withColumn("_area", area)
        .groupBy(*by)
        .agg((F.sum("_area") / span).alias(alias))
    )
