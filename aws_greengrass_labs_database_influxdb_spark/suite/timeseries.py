"""Time-series operator queries over the ``events`` table (reshaped to
canonical points) with DuckDB oracles.

Float-parity strategy (applies to every query here):
- All sums/cumulative sums go through ``DECIMAL(12,2)`` (the data has
  2-decimal values) → exact arithmetic in both engines → bit-identical
  doubles after the final cast.
- Ratio/moment statistics are computed from exact integer sums
  (``round(value*100)`` as BIGINT) with identical double expression
  trees on both sides.
- Pure row-local arithmetic (lag differences, derivative) is written
  with structurally identical IEEE expressions on both sides — no
  rounding needed.
- Timestamps are emitted as epoch-ms BIGINT (both engines floor µs).

Window/order tie-breaking: (time, event_id) — a total order, since
µs-truncated timestamps can collide.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .. import operators as ops
from ..sources.io import events_points
from . import q

HOUR_NS = 3600 * 10**9
# events data spans 2024-01; correctness range literals used on both sides
RANGE_START_NS = 1704067200 * 10**9  # 2024-01-01T00:00:00Z
RANGE_STOP_NS = 1706659200 * 10**9  # 2024-01-31T00:00:00Z

# epoch-ns of the (µs-truncated) event time, as DuckDB sees it too
SQL_TNS = "(epoch_us(ts) * 1000)"
ORDER = ["time_ns", "ingest_seq"]
SQL_ORDER = "ts, event_id"

DEC_SUM = "cast(sum(cast(value as decimal(12,2))) as double)"


def _pts(spark, sf_dir):
    return events_points(spark, sf_dir)


def _w_ms(col="_start_ns"):
    return F.expr(f"{col} div 1000000")  # integer div: exact ns→ms


# ------------------------------------------------------------------ windows

@q(
    "ts_agg_window_mean",
    f"""
    SELECT event_type,
           epoch_ms(time_bucket(INTERVAL 1 HOUR, ts)) AS w_ms,
           {DEC_SUM} / count(*) AS mean_value,
           count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def ts_agg_window_mean(spark, sf_dir):
    """aggregateWindow(every:1h, fn:mean) by event_type — the flagship
    telemetry-dashboard shape (tumbling window via exact ns arithmetic)."""
    p = _pts(spark, sf_dir)
    w = ops.window(p, HOUR_NS)
    return w.groupBy("event_type", "_start_ns").agg(
        (F.sum(F.col("f_float").cast("decimal(12,2)")).cast("double") / F.count(F.lit(1))).alias("mean_value"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        "event_type", _w_ms().alias("w_ms"), "mean_value", "n"
    )


@q(
    "ts_agg_window_create_empty",
    f"""
    WITH grid AS (
      SELECT g AS wstart
      FROM generate_series(TIMESTAMP '2024-01-01 00:00:00',
                           TIMESTAMP '2024-01-30 23:00:00', INTERVAL 1 HOUR) t(g)),
    et AS (SELECT DISTINCT event_type FROM events),
    agg AS (
      SELECT event_type, time_bucket(INTERVAL 1 HOUR, ts) AS wstart,
             {DEC_SUM} / count(*) AS m, count(*) AS n
      FROM events GROUP BY 1, 2)
    SELECT et.event_type, epoch_ms(grid.wstart) AS w_ms,
           coalesce(agg.m, 0.0) AS mean_value, coalesce(agg.n, 0) AS n
    FROM et CROSS JOIN grid
    LEFT JOIN agg ON agg.event_type = et.event_type AND agg.wstart = grid.wstart
    """,
)
def ts_agg_window_create_empty(spark, sf_dir):
    """aggregateWindow(createEmpty:true) + fill(0): the window spine
    emits every (series × hour) row across the whole range."""
    p = _pts(spark, sf_dir)
    w = ops.window(p, HOUR_NS)
    agg = w.groupBy("event_type", "_start_ns").agg(
        (F.sum(F.col("f_float").cast("decimal(12,2)")).cast("double") / F.count(F.lit(1))).alias("mean_value"),
        F.count(F.lit(1)).alias("n"),
    )
    spine = ops.window_spine(p, RANGE_START_NS, RANGE_STOP_NS, HOUR_NS, by=["event_type"])
    joined = spine.join(agg, on=["event_type", "_start_ns"], how="left")
    joined = ops.fill(joined, "mean_value", value=0.0)
    joined = ops.fill(joined, "n", value=0)
    return joined.select("event_type", _w_ms().alias("w_ms"), "mean_value", "n")


# ---------------------------------------------------------------- selectors

@q(
    "ts_first_last",
    """
    WITH r AS (
      SELECT *,
        row_number() OVER (PARTITION BY event_type ORDER BY ts ASC, event_id ASC) rn_a,
        row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC) rn_d
      FROM events)
    SELECT event_type,
           max(CASE WHEN rn_a = 1 THEN value END) AS first_value,
           max(CASE WHEN rn_a = 1 THEN epoch_ms(ts) END) AS first_ms,
           max(CASE WHEN rn_d = 1 THEN value END) AS last_value,
           max(CASE WHEN rn_d = 1 THEN epoch_ms(ts) END) AS last_ms
    FROM r GROUP BY 1
    """,
)
def ts_first_last(spark, sf_dir):
    """first()/last() selectors: the original row at min/max time."""
    p = _pts(spark, sf_dir)
    first = ops.first(p, by=["event_type"]).select(
        "event_type",
        F.col("f_float").alias("first_value"),
        F.expr("time_ns div 1000000").alias("first_ms"),
    )
    last = ops.last(p, by=["event_type"]).select(
        "event_type",
        F.col("f_float").alias("last_value"),
        F.expr("time_ns div 1000000").alias("last_ms"),
    )
    return first.join(last, "event_type")


@q(
    "ts_min_max_selector",
    """
    WITH r AS (
      SELECT *,
        row_number() OVER (PARTITION BY event_type ORDER BY value ASC, ts ASC, event_id ASC) rn_min,
        row_number() OVER (PARTITION BY event_type ORDER BY value DESC, ts ASC, event_id ASC) rn_max
      FROM events)
    SELECT event_type,
           max(CASE WHEN rn_min = 1 THEN value END) AS min_value,
           max(CASE WHEN rn_min = 1 THEN event_id END) AS min_event_id,
           max(CASE WHEN rn_max = 1 THEN value END) AS max_value,
           max(CASE WHEN rn_max = 1 THEN event_id END) AS max_event_id
    FROM r GROUP BY 1
    """,
)
def ts_min_max_selector(spark, sf_dir):
    """MIN/MAX selectors: extreme-value row, ties → earliest time."""
    p = _pts(spark, sf_dir)
    mn = ops.min_selector(p, by=["event_type"]).select(
        "event_type",
        F.col("f_float").alias("min_value"),
        F.col("ingest_seq").alias("min_event_id"),
    )
    mx = ops.max_selector(p, by=["event_type"]).select(
        "event_type",
        F.col("f_float").alias("max_value"),
        F.col("ingest_seq").alias("max_event_id"),
    )
    return mn.join(mx, "event_type")


@q(
    "ts_top3",
    """
    SELECT event_type, event_id, value, epoch_ms(ts) AS t_ms FROM (
      SELECT *, row_number() OVER (
        PARTITION BY event_type ORDER BY value DESC, ts ASC, event_id ASC) rn
      FROM events) WHERE rn <= 3
    """,
)
def ts_top3(spark, sf_dir):
    """top(n:3) per series."""
    p = _pts(spark, sf_dir)
    t = ops.top(p, 3, by=["event_type"])
    return t.select(
        "event_type",
        F.col("ingest_seq").alias("event_id"),
        F.col("f_float").alias("value"),
        F.expr("time_ns div 1000000").alias("t_ms"),
    )


@q(
    "ts_limit_per_series",
    f"""
    SELECT event_type, event_id, value FROM (
      SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY {SQL_ORDER}) rn
      FROM events) WHERE rn > 2 AND rn <= 7
    """,
)
def ts_limit_per_series(spark, sf_dir):
    """limit(n:5, offset:2) — per series, NOT global."""
    p = _pts(spark, sf_dir)
    lim = ops.limit(p, 5, offset=2, by=["event_type"], order=ORDER)
    return lim.select(
        "event_type", F.col("ingest_seq").alias("event_id"), F.col("f_float").alias("value")
    )


# ---------------------------------------------------------- per-series math

@q(
    "ts_derivative",
    f"""
    SELECT event_id, event_type, deriv FROM (
      SELECT event_id, event_type,
             (value - lag(value) OVER w) /
             (({SQL_TNS} - lag({SQL_TNS}) OVER w) / 1e9) AS deriv,
             lag(ts) OVER w AS prev_ts
      FROM events WINDOW w AS (PARTITION BY event_type ORDER BY {SQL_ORDER}))
    WHERE prev_ts IS NOT NULL
    """,
)
def ts_derivative(spark, sf_dir):
    """derivative(unit: 1s) per series — bit-identical IEEE arithmetic."""
    p = _pts(spark, sf_dir)
    d = ops.derivative(p, unit_seconds=1.0, by=["event_type"], order=ORDER)
    return d.select(
        F.col("ingest_seq").alias("event_id"), "event_type", F.col("derivative").alias("deriv")
    )


@q(
    "ts_difference",
    f"""
    SELECT event_id, event_type,
           value - lag(value) OVER (PARTITION BY event_type ORDER BY {SQL_ORDER}) AS diff
    FROM events
    """,
)
def ts_difference(spark, sf_dir):
    """difference() per series (first row stays null, as Flux keepFirst)."""
    p = _pts(spark, sf_dir)
    d = ops.difference(p, by=["event_type"], order=ORDER, alias="diff")
    return d.select(F.col("ingest_seq").alias("event_id"), "event_type", "diff")


@q(
    "ts_cumulative_sum",
    f"""
    SELECT event_id, event_type,
           cast(sum(cast(value as decimal(12,2))) OVER (
             PARTITION BY event_type ORDER BY {SQL_ORDER}
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as double) AS csum
    FROM events
    """,
)
def ts_cumulative_sum(spark, sf_dir):
    """cumulativeSum() per series — decimal-exact running sum."""
    p = _pts(spark, sf_dir).withColumn("_vdec", F.col("f_float").cast("decimal(12,2)"))
    c = ops.cumulative_sum(p, value="_vdec", by=["event_type"], order=ORDER, alias="csum")
    return c.select(
        F.col("ingest_seq").alias("event_id"),
        "event_type",
        F.col("csum").cast("double").alias("csum"),
    )


@q(
    "ts_moving_average",
    f"""
    SELECT event_id, event_type, ma FROM (
      SELECT event_id, event_type,
             cast(sum(cast(value as decimal(12,2))) OVER w5 as double) / 5 AS ma,
             count(*) OVER w5 AS n5
      FROM events
      WINDOW w5 AS (PARTITION BY event_type ORDER BY {SQL_ORDER}
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
    WHERE n5 = 5
    """,
)
def ts_moving_average(spark, sf_dir):
    """movingAverage(n:5) — emitted once the window is full (Flux rule)."""
    from pyspark.sql import Window as W

    p = _pts(spark, sf_dir)
    w5 = W.partitionBy("event_type").orderBy("time_ns", "ingest_seq").rowsBetween(-4, 0)
    return (
        p.withColumn("ma", F.sum(F.col("f_float").cast("decimal(12,2)")).over(w5).cast("double") / 5)
        .withColumn("_n5", F.count(F.lit(1)).over(w5))
        .filter(F.col("_n5") == 5)
        .select(F.col("ingest_seq").alias("event_id"), "event_type", "ma")
    )


@q(
    "ts_elapsed",
    f"""
    SELECT event_id, event_type, elapsed_s FROM (
      SELECT event_id, event_type,
             cast(floor(({SQL_TNS} - lag({SQL_TNS}) OVER (
               PARTITION BY event_type ORDER BY {SQL_ORDER})) / 1e9) as bigint) AS elapsed_s
      FROM events) WHERE elapsed_s IS NOT NULL
    """,
)
def ts_elapsed(spark, sf_dir):
    """elapsed(unit:1s) per series."""
    p = _pts(spark, sf_dir)
    e = ops.elapsed(p, unit_seconds=1.0, by=["event_type"], order=ORDER, alias="elapsed_s")
    return e.filter(F.col("elapsed_s").isNotNull()).select(
        F.col("ingest_seq").alias("event_id"), "event_type", "elapsed_s"
    )


@q(
    "ts_state_count",
    f"""
    WITH b AS (
      SELECT event_id, event_type, ts,
             CASE WHEN value > 100 THEN 1 ELSE 0 END m
      FROM events),
    r AS (
      SELECT *, sum(1 - m) OVER (PARTITION BY event_type ORDER BY {SQL_ORDER}
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) run
      FROM b)
    SELECT event_id, event_type,
           CASE WHEN m = 1 THEN cast(sum(m) OVER (PARTITION BY event_type, run
             ORDER BY {SQL_ORDER} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint)
           ELSE -1 END AS state_count
    FROM r
    """,
)
def ts_state_count(spark, sf_dir):
    """stateCount(fn: value > 100) — gaps-and-islands run numbering."""
    p = _pts(spark, sf_dir)
    s = ops.state_count(p, F.col("f_float") > 100, by=["event_type"], order=ORDER)
    return s.select(
        F.col("ingest_seq").alias("event_id"),
        "event_type",
        F.col("state_count").cast("long").alias("state_count"),
    )


# ------------------------------------------------------------- aggregations

@q(
    "ts_spread_stats",
    """
    WITH w AS (
      SELECT event_type, value, cast(round(value * 100) as bigint) AS wv FROM events),
    s AS (
      SELECT event_type,
             count(*) AS n,
             cast(sum(wv) as bigint) AS s1,
             cast(sum(wv * wv) as bigint) AS s2,
             max(value) AS vmax, min(value) AS vmin,
             median(value) AS med
      FROM w GROUP BY 1)
    SELECT event_type, n,
           (s1 / 100.0) / n AS mean_value,
           vmax - vmin AS spread,
           sqrt((s2 / 1e4 - (s1 / 100.0) * (s1 / 100.0) / n) / (n - 1)) AS stddev_value,
           med
    FROM s
    """,
)
def ts_spread_stats(spark, sf_dir):
    """count/mean/spread/stddev/median per series — moment statistics
    from exact integer sums (deterministic across engines)."""
    p = _pts(spark, sf_dir).withColumn(
        "_wv", F.round(F.col("f_float") * 100).cast("long")
    )
    s = p.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_wv").alias("s1"),
        F.sum(F.col("_wv") * F.col("_wv")).alias("s2"),
        F.max("f_float").alias("vmax"),
        F.min("f_float").alias("vmin"),
        F.median("f_float").alias("med"),
    )
    return s.select(
        "event_type",
        "n",
        ((F.col("s1") / 100.0) / F.col("n")).alias("mean_value"),
        (F.col("vmax") - F.col("vmin")).alias("spread"),
        F.sqrt(
            (F.col("s2") / 1e4 - (F.col("s1") / 100.0) * (F.col("s1") / 100.0) / F.col("n"))
            / (F.col("n") - 1)
        ).alias("stddev_value"),
        "med",
    )


@q(
    "ts_mode",
    """
    WITH c AS (
      SELECT event_type, cast(round(value) as bigint) v, count(*) n
      FROM events GROUP BY 1, 2),
    r AS (SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY n DESC, v ASC) rn FROM c)
    SELECT event_type, v AS mode FROM r WHERE rn = 1
    """,
)
def ts_mode(spark, sf_dir):
    """mode() — most frequent (rounded) value; ties → smallest."""
    p = _pts(spark, sf_dir).withColumn("_vr", F.round("f_float").cast("long"))
    return ops.mode_value(p, "_vr", by=["event_type"])
