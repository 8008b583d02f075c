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
    "ts_window_tz",
    f"""
    SELECT event_type,
           epoch_ms(time_bucket(INTERVAL 1 DAY, timezone('UTC', ts),
                    'America/Chicago')) AS w_ms,
           {DEC_SUM} AS sum_value,
           count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def ts_window_tz(spark, sf_dir):
    """Flux ``option location`` — daily windows aligned to America/
    Chicago local midnight (06:00Z in January). Wall-clock bucketing is
    pure Column arithmetic (`from_utc_timestamp` → integer div →
    `to_utc_timestamp`), still one codegen'd hash aggregate; DST
    23/25-hour days are pinned in tests/test_tz_windows.py (the
    January data has no transition)."""
    p = _pts(spark, sf_dir)
    w = ops.window(p, "1d", tz="America/Chicago")
    return w.groupBy("event_type", "_start_ns").agg(
        F.sum(F.col("f_float").cast("decimal(12,2)")).cast("double").alias("sum_value"),
        F.count(F.lit(1)).alias("n"),
    ).select("event_type", _w_ms().alias("w_ms"), "sum_value", "n")


@q(
    "ts_rollup_routed",
    f"""
    SELECT event_type,
           epoch_ms(time_bucket(INTERVAL 1 HOUR, ts)) AS w_ms,
           {DEC_SUM} / count(*) AS mean_value,
           count(*) AS n
    FROM events GROUP BY 1, 2
    """,
)
def ts_rollup_routed(spark, sf_dir):
    """Materialized-downsample routing (SURVEY §4.2): the hourly mean is
    served from a 1-minute rollup of partials, not raw points. DECIMAL
    partial sums make the two-phase re-aggregation bit-identical to the
    direct aggregation — same oracle as ts_agg_window_mean."""
    from ..plans.rollup import build_rollup, reaggregate

    p = _pts(spark, sf_dir)
    rp = build_rollup(p, 60 * 10**9, by=("event_type",))
    hourly = reaggregate(rp, HOUR_NS, "mean", by=("event_type",), alias="mean_value")
    n = reaggregate(rp, HOUR_NS, "count", by=("event_type",), alias="n")
    return (
        hourly.join(n.select("event_type", "_start_ns", "n"), ["event_type", "_start_ns"])
        .select("event_type", _w_ms().alias("w_ms"), "mean_value", "n")
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
    SELECT event_id, event_type, diff FROM (
      SELECT event_id, event_type,
             value - lag(value) OVER w AS diff,
             lag(ts) OVER w AS prev_ts
      FROM events WINDOW w AS (PARTITION BY event_type ORDER BY {SQL_ORDER}))
    WHERE prev_ts IS NOT NULL
    """,
)
def ts_difference(spark, sf_dir):
    """difference() per series — stock ``keepFirst: false`` default
    drops each table's first row (r15: the old oracle pinned the
    keepFirst-true shape and mislabeled it as the default)."""
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


# --------------------------------------------------------------- fills etc.

@q(
    "ts_fill_previous",
    f"""
    WITH grid AS (
      SELECT g AS wstart
      FROM generate_series(TIMESTAMP '2024-01-01 00:00:00',
                           TIMESTAMP '2024-01-30 23:00:00', INTERVAL 1 HOUR) t(g)),
    et AS (SELECT DISTINCT event_type FROM events),
    agg AS (
      SELECT event_type, time_bucket(INTERVAL 1 HOUR, ts) AS wstart,
             {DEC_SUM} AS s
      FROM events GROUP BY 1, 2),
    j AS (
      SELECT et.event_type, grid.wstart, agg.s
      FROM et CROSS JOIN grid
      LEFT JOIN agg ON agg.event_type = et.event_type AND agg.wstart = grid.wstart)
    SELECT event_type, epoch_ms(wstart) AS w_ms,
           last_value(s IGNORE NULLS) OVER (
             PARTITION BY event_type ORDER BY wstart
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_sum
    FROM j
    """,
)
def ts_fill_previous(spark, sf_dir):
    """InfluxQL ``GROUP BY time(1h) fill(previous)``: window spine +
    per-series forward fill."""
    p = _pts(spark, sf_dir)
    w = ops.window(p, HOUR_NS)
    agg = w.groupBy("event_type", "_start_ns").agg(
        F.sum(F.col("f_float").cast("decimal(12,2)")).cast("double").alias("filled_sum")
    )
    spine = ops.window_spine(p, RANGE_START_NS, RANGE_STOP_NS, HOUR_NS, by=["event_type"])
    j = spine.join(agg, on=["event_type", "_start_ns"], how="left")
    filled = ops.fill(j, "filled_sum", use_previous=True, by=["event_type"], order="_start_ns")
    return filled.select("event_type", _w_ms().alias("w_ms"), "filled_sum")


@q(
    "ts_interpolate_linear",
    f"""
    WITH grid AS (
      SELECT epoch_us(g) * 1000 AS tns, CAST(NULL AS DOUBLE) AS v, 1 AS is_grid
      FROM generate_series(TIMESTAMP '2024-01-01 00:00:00',
                           TIMESTAMP '2024-01-30 23:00:00', INTERVAL 1 HOUR) t(g)),
    et AS (SELECT DISTINCT event_type FROM events),
    g2 AS (SELECT et.event_type, grid.* FROM et CROSS JOIN grid),
    d AS (SELECT event_type, {SQL_TNS} AS tns, value AS v, 0 AS is_grid FROM events),
    u AS (SELECT * FROM g2 UNION ALL SELECT * FROM d),
    f AS (
      SELECT *,
        last_value(v IGNORE NULLS) OVER wp AS prev_v,
        last_value(CASE WHEN v IS NOT NULL THEN tns END IGNORE NULLS) OVER wp AS prev_t,
        first_value(v IGNORE NULLS) OVER wn AS next_v,
        first_value(CASE WHEN v IS NOT NULL THEN tns END IGNORE NULLS) OVER wn AS next_t
      FROM u
      WINDOW wp AS (PARTITION BY event_type ORDER BY tns, is_grid
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY event_type ORDER BY tns, is_grid
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT event_type, tns // 1000000 AS t_ms,
           CASE WHEN v IS NOT NULL THEN v
                WHEN prev_t = tns THEN prev_v
                WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                THEN prev_v + (next_v - prev_v) * (tns - prev_t) / (next_t - prev_t)
           END AS iv
    FROM f WHERE is_grid = 1 AND (v IS NOT NULL OR prev_t = tns
                                  OR (prev_v IS NOT NULL AND next_v IS NOT NULL))
    """,
)
def ts_interpolate_linear(spark, sf_dir):
    """interpolate.linear(every:1h) — grid resample with lerp.

    Subtle parity detail: a real point can coincide with a grid
    timestamp; both sides order (tns, is_grid) so the fill sees the
    real value first.
    """
    p = _pts(spark, sf_dir)
    i = ops.interpolate_linear(
        p, HOUR_NS, value="f_float", by=["event_type"],
        range_start=RANGE_START_NS, range_stop=RANGE_STOP_NS,
    )
    return i.select(
        "event_type", F.expr("time_ns div 1000000").alias("t_ms"), F.col("f_float").alias("iv")
    )


@q(
    "ts_increase",
    f"""
    WITH d AS (
      SELECT event_id, event_type, ts,
             cast(value as decimal(12,2)) AS v,
             cast(value as decimal(12,2)) - lag(cast(value as decimal(12,2)))
               OVER (PARTITION BY event_type ORDER BY {SQL_ORDER}) AS delta
      FROM events)
    SELECT event_id, event_type,
           cast(sum(CASE WHEN delta IS NULL THEN 0 WHEN delta < 0 THEN v ELSE delta END)
             OVER (PARTITION BY event_type ORDER BY {SQL_ORDER}
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as double) AS inc
    FROM d
    """,
)
def ts_increase(spark, sf_dir):
    """increase(): monotone counter accumulation with reset handling,
    decimal-exact."""
    p = _pts(spark, sf_dir).withColumn("_vdec", F.col("f_float").cast("decimal(12,2)"))
    i = ops.increase(p, value="_vdec", by=["event_type"], order=ORDER, alias="inc")
    return i.select(
        F.col("ingest_seq").alias("event_id"),
        "event_type",
        F.col("inc").cast("double").alias("inc"),
    )


@q(
    "ts_integral",
    f"""
    WITH d AS (
      SELECT event_type,
             cast(round(value * 100) as bigint) AS wv,
             lag(cast(round(value * 100) as bigint)) OVER w AS pwv,
             {SQL_TNS} - lag({SQL_TNS}) OVER w AS dt_ns
      FROM events WINDOW w AS (PARTITION BY event_type ORDER BY {SQL_ORDER}))
    SELECT event_type,
           round(cast(cast(sum((wv + pwv) * dt_ns) as double) / 2e11 as double), 6) AS integral_s
    FROM d WHERE pwv IS NOT NULL GROUP BY 1
    """,
)
def ts_integral(spark, sf_dir):
    """integral(unit:1s): trapezoid sum — exact via integer area terms
    (value×100 as bigint × Δns), one final double division, 6dp-rounded
    (DuckDB's HUGEINT→double cast can be 1 ulp off the correctly-rounded
    value Spark's decimal→double produces)."""
    p = _pts(spark, sf_dir)
    from pyspark.sql import Window as W

    w = W.partitionBy("event_type").orderBy("time_ns", "ingest_seq")
    wv = F.round(F.col("f_float") * 100).cast("long")
    d = (
        p.withColumn("_wv", wv)
        .withColumn("_pwv", F.lag("_wv").over(w))
        .withColumn("_dt", F.col("time_ns") - F.lag("time_ns").over(w))
    )
    area = (F.col("_wv") + F.col("_pwv")) * F.col("_dt")
    return (
        d.filter(F.col("_pwv").isNotNull())
        .groupBy("event_type")
        .agg(
            F.round(
                (F.sum(area.cast("decimal(38,0)")).cast("double") / F.lit(2e11)).cast("double"), 6
            ).alias("integral_s")
        )
    )


@q(
    "ts_timed_moving_average",
    f"""
    SELECT event_id, event_type,
           cast(sum(cast(value as decimal(12,2))) OVER wr as double)
             / count(*) OVER wr AS tma
    FROM events
    WINDOW wr AS (PARTITION BY event_type ORDER BY {SQL_TNS}
                  RANGE BETWEEN 86399999999999 PRECEDING AND CURRENT ROW)
    """,
)
def ts_timed_moving_average(spark, sf_dir):
    """timedMovingAverage(period: 1d): trailing time-range window mean.

    RANGE frame over epoch-ns — Spark and DuckDB agree because peer
    rows (same tns) aggregate together in RANGE mode.
    """
    from pyspark.sql import Window as W

    p = _pts(spark, sf_dir)
    wr = (
        W.partitionBy("event_type")
        .orderBy("time_ns")
        .rangeBetween(-(86400 * 10**9 - 1), 0)
    )
    return p.select(
        F.col("ingest_seq").alias("event_id"),
        "event_type",
        (
            F.sum(F.col("f_float").cast("decimal(12,2)")).over(wr).cast("double")
            / F.count(F.lit(1)).over(wr)
        ).alias("tma"),
    )


@q(
    "ts_state_duration",
    f"""
    WITH b AS (
      SELECT event_id, event_type, ts,
             CASE WHEN value > 100 THEN 1 ELSE 0 END m
      FROM events),
    r AS (
      SELECT *, sum(1 - m) OVER (PARTITION BY event_type ORDER BY {SQL_ORDER}
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) run
      FROM b),
    s AS (
      SELECT *, min(CASE WHEN m = 1 THEN epoch_us(ts) * 1000 END) OVER (
               PARTITION BY event_type, run ORDER BY {SQL_ORDER}
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS start_t
      FROM r)
    SELECT event_id, event_type,
           CASE WHEN m = 1
                THEN cast(floor((epoch_us(ts) * 1000 - start_t) / 1e9) as bigint)
                ELSE -1 END AS state_duration_s
    FROM s
    """,
)
def ts_state_duration(spark, sf_dir):
    """stateDuration(fn: value > 100, unit: 1s)."""
    p = _pts(spark, sf_dir)
    s = ops.state_duration(
        p, F.col("f_float") > 100, unit_seconds=1.0, by=["event_type"], order=ORDER,
        alias="state_duration_s",
    )
    return s.select(
        F.col("ingest_seq").alias("event_id"),
        "event_type",
        F.col("state_duration_s").cast("long").alias("state_duration_s"),
    )


# ----------------------------------------------------------- distinct & sets

@q(
    "ts_unique",
    """
    SELECT event_id, event_type, vr FROM (
      SELECT event_id, event_type, cast(round(value) as bigint) AS vr,
             count(*) OVER (PARTITION BY event_type, cast(round(value) as bigint)) AS n
      FROM events) WHERE n = 1
    """,
)
def ts_unique(spark, sf_dir):
    """unique(column:): rows whose (rounded) value occurs exactly once
    within the series."""
    p = _pts(spark, sf_dir).withColumn("vr", F.round("f_float").cast("long"))
    u = ops.unique(p, "vr", by=["event_type"])
    return u.select(F.col("ingest_seq").alias("event_id"), "event_type", "vr")


@q(
    "ts_distinct",
    """
    SELECT DISTINCT event_type, cast(round(value) as bigint) AS vr FROM events
    """,
)
def ts_distinct(spark, sf_dir):
    """distinct(column:) per group key."""
    p = _pts(spark, sf_dir).withColumn("vr", F.round("f_float").cast("long"))
    return ops.distinct_rows(p, "vr", by=["event_type"])


@q(
    "ts_tail",
    f"""
    SELECT event_type, event_id, value FROM (
      SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY ts DESC, event_id DESC) rn
      FROM events) WHERE rn <= 4
    """,
)
def ts_tail(spark, sf_dir):
    """tail(n:4): last n rows per series."""
    p = _pts(spark, sf_dir)
    t = ops.tail(p, 4, by=["event_type"], order=ORDER)
    return t.select(
        "event_type", F.col("ingest_seq").alias("event_id"), F.col("f_float").alias("value")
    )


@q(
    "ts_slimit",
    """
    SELECT event_type, count(*) AS n, cast(sum(cast(value as decimal(12,2))) as double) AS sum_value
    FROM events
    WHERE event_type IN (SELECT event_type FROM (SELECT DISTINCT event_type FROM events)
                         ORDER BY event_type LIMIT 3)
    GROUP BY 1
    """,
)
def ts_slimit(spark, sf_dir):
    """InfluxQL SLIMIT 3: keep the first 3 series, then aggregate."""
    p = _pts(spark, sf_dir)
    s = ops.slimit(p, 3, series=["event_type"])
    return s.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("f_float").cast("decimal(12,2)")).cast("double").alias("sum_value"),
    )


@q(
    "ts_pivot",
    """
    SELECT date_trunc('day', ts) AS day,
           cast(sum(CASE WHEN event_type = 'click' THEN cast(value as decimal(12,2)) END) as double) AS click,
           cast(sum(CASE WHEN event_type = 'error' THEN cast(value as decimal(12,2)) END) as double) AS error,
           cast(sum(CASE WHEN event_type = 'purchase' THEN cast(value as decimal(12,2)) END) as double) AS purchase,
           cast(sum(CASE WHEN event_type = 'signup' THEN cast(value as decimal(12,2)) END) as double) AS signup,
           cast(sum(CASE WHEN event_type = 'view' THEN cast(value as decimal(12,2)) END) as double) AS view
    FROM events GROUP BY 1
    """,
)
def ts_pivot(spark, sf_dir):
    """pivot(rowKey:[day], columnKey:event_type, valueColumn:sum) — with
    the value list passed explicitly (skips Spark's distinct pre-scan)."""
    p = _pts(spark, sf_dir)
    day = F.date_trunc("day", F.col("time")).alias("day")
    base = p.select(day, "event_type", F.col("f_float").cast("decimal(12,2)").alias("v"))
    return ops.pivot(
        base, row_key=["day"], column_key="event_type", value_column="v",
        values=["click", "error", "purchase", "signup", "view"],
        agg=F.sum("v").cast("double"),
    )


@q(
    "ts_union",
    """
    WITH u AS (
      SELECT event_id, value FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT event_id, value FROM events WHERE value > 150)
    SELECT count(*) AS n, cast(sum(cast(value as decimal(12,2))) as double) AS sum_value FROM u
    """,
)
def ts_union(spark, sf_dir):
    """union(tables:): concatenation (UNION ALL semantics in Flux)."""
    p = _pts(spark, sf_dir)
    a = p.filter(F.col("event_type") == "click").select(F.col("ingest_seq").alias("event_id"), "f_float")
    b = p.filter(F.col("f_float") > 150).select(F.col("ingest_seq").alias("event_id"), "f_float")
    u = a.unionByName(b)
    return u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("f_float").cast("decimal(12,2)")).cast("double").alias("sum_value"),
    )


@q(
    "ts_join_hourly",
    f"""
    WITH c AS (
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS h, {DEC_SUM} AS click_sum, count(*) AS click_n
      FROM events WHERE event_type = 'click' GROUP BY 1),
    e AS (
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS h, {DEC_SUM} AS error_sum, count(*) AS error_n
      FROM events WHERE event_type = 'error' GROUP BY 1)
    SELECT epoch_ms(c.h) AS h_ms, click_sum, click_n, error_sum, error_n
    FROM c JOIN e ON c.h = e.h
    """,
)
def ts_join_hourly(spark, sf_dir):
    """join(tables:{a,b}, on:["_time"]): inner equi-join of two series'
    hourly aggregates on the time column (the canonical Flux join)."""
    p = _pts(spark, sf_dir)
    w = ops.window(p, HOUR_NS)

    def hourly(et, prefix):
        return (
            w.filter(F.col("event_type") == et)
            .groupBy("_start_ns")
            .agg(
                F.sum(F.col("f_float").cast("decimal(12,2)")).cast("double").alias(f"{prefix}_sum"),
                F.count(F.lit(1)).alias(f"{prefix}_n"),
            )
        )

    j = hourly("click", "click").join(hourly("error", "error"), on="_start_ns", how="inner")
    return j.select(_w_ms().alias("h_ms"), "click_sum", "click_n", "error_sum", "error_n")


@q(
    "ts_window_sliding",
    f"""
    WITH grid AS (
      SELECT g AS wstart
      FROM generate_series(TIMESTAMP '2023-12-31 23:00:00',
                           TIMESTAMP '2024-01-30 23:00:00', INTERVAL 1 HOUR) t(g))
    SELECT event_type, epoch_ms(wstart) AS w_ms, count(*) AS n,
           {DEC_SUM} AS sum_value
    FROM grid JOIN events
      ON ts >= wstart AND ts < wstart + INTERVAL 2 HOUR
    GROUP BY 1, 2
    """,
)
def ts_window_sliding(spark, sf_dir):
    """window(every:1h, period:2h): overlapping windows — each row lands
    in 2 windows (Spark explodes them JVM-side via F.window)."""
    p = _pts(spark, sf_dir)
    w = ops.window(p, every="1h", period="2h")
    return w.groupBy("event_type", "_start_ns").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("f_float").cast("decimal(12,2)")).cast("double").alias("sum_value"),
    ).select("event_type", _w_ms().alias("w_ms"), "n", "sum_value")


# ------------------------------------------------------------ 2-col stats

@q(
    "ts_covariance_corr",
    """
    WITH w AS (
      SELECT event_type,
             cast(round(value * 100) as bigint) AS wv,
             user_id AS u
      FROM events),
    s AS (
      SELECT event_type, count(*) AS n,
             cast(sum(wv) as bigint) AS sx, cast(sum(u) as bigint) AS sy,
             cast(sum(wv * u) as bigint) AS sxy,
             cast(sum(wv * wv) as bigint) AS sxx, cast(sum(u * u) as bigint) AS syy
      FROM w GROUP BY 1)
    SELECT event_type, n,
           (sxy / 100.0 - (sx / 100.0) * sy / n) / (n - 1) AS covariance,
           (n * (sxy / 100.0) - (sx / 100.0) * sy) /
             (sqrt(n * (sxx / 1e4) - (sx / 100.0) * (sx / 100.0)) * sqrt((n * syy - sy * sy) * 1.0))
             AS pearson_r
    FROM s
    """,
)
def ts_covariance_corr(spark, sf_dir):
    """covariance()/pearsonr() — computed from exact integer moment sums
    so both engines produce bit-identical doubles (built-in covar/corr
    use different accumulation algorithms across engines)."""
    p = _pts(spark, sf_dir).select(
        "event_type",
        F.round(F.col("f_float") * 100).cast("long").alias("wv"),
        F.col("user_id").alias("u"),
    )
    s = p.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("wv").alias("sx"),
        F.sum("u").alias("sy"),
        F.sum(F.col("wv") * F.col("u")).alias("sxy"),
        F.sum(F.col("wv") * F.col("wv")).alias("sxx"),
        F.sum(F.col("u") * F.col("u")).alias("syy"),
    )
    n, sx, sy, sxy, sxx, syy = [F.col(c) for c in ["n", "sx", "sy", "sxy", "sxx", "syy"]]
    return s.select(
        "event_type",
        "n",
        ((sxy / 100.0 - (sx / 100.0) * sy / n) / (n - 1)).alias("covariance"),
        (
            (n * (sxy / 100.0) - (sx / 100.0) * sy)
            / (
                F.sqrt(n * (sxx / 1e4) - (sx / 100.0) * (sx / 100.0))
                * F.sqrt((n * syy - sy * sy) * 1.0)
            )
        ).alias("pearson_r"),
    )


# ------------------------------------------------------ scalar fn packages

@q(
    "ts_scalar_functions",
    """
    SELECT event_id,
           abs(value - 100) AS m_abs,
           cast(ceil(value) as bigint) AS m_ceil,
           cast(floor(value) as bigint) AS m_floor,
           sqrt(value) AS m_sqrt,
           round(exp(value / 200), 9) AS m_exp,
           round(ln(value + 1), 9) AS m_log,
           round(pow(value, 2), 6) AS m_pow,
           upper(event_type) AS s_upper,
           substring(event_type, 1, 3) AS s_substr,
           length(event_type) AS s_len,
           contains(event_type, 'ck') AS s_contains,
           starts_with(event_type, 'cl') AS s_prefix,
           replace(event_type, 'c', 'C') AS s_replace,
           regexp_extract(props, '"k": (\\d+)', 1) AS r_extract,
           cast(year(ts) as bigint) AS d_year,
           cast(month(ts) as bigint) AS d_month,
           cast(hour(ts) as bigint) AS d_hour,
           cast(minute(ts) as bigint) AS d_minute,
           cast(dayofmonth(ts) as bigint) AS d_dom,
           cast(dayofweek(ts) as bigint) AS d_dow_sun0,
           cast(trunc(value) as bigint) AS c_int,
           cast(value as varchar) AS c_str,
           CASE WHEN value > 100 THEN 'high' ELSE 'low' END AS cond_level,
           cast(json_extract_string(props, '$.k') as bigint) AS j_k
    FROM events
    """,
)
def ts_scalar_functions(spark, sf_dir):
    """The Flux stdlib scalar surface (math./strings./regexp./date./
    conversion/json/conditional) mapped to pyspark.sql.functions.

    Transcendentals (exp/ln) round(9): both engines call correctly-
    rounded libm but are not bit-guaranteed; everything else is exact.
    Day-of-week uses Sunday=0 on both sides (Spark's dayofweek is
    Sunday=1 → shifted).
    """
    ev = _pts(spark, sf_dir)
    return ev.select(
        F.col("ingest_seq").alias("event_id"),
        F.abs(F.col("f_float") - 100).alias("m_abs"),
        F.ceil("f_float").cast("long").alias("m_ceil"),
        F.floor("f_float").cast("long").alias("m_floor"),
        F.sqrt("f_float").alias("m_sqrt"),
        F.round(F.exp(F.col("f_float") / 200), 9).alias("m_exp"),
        F.round(F.log(F.col("f_float") + 1), 9).alias("m_log"),
        F.round(F.pow("f_float", 2), 6).alias("m_pow"),
        F.upper("event_type").alias("s_upper"),
        F.substring("event_type", 1, 3).alias("s_substr"),
        F.length("event_type").cast("long").alias("s_len"),
        F.col("event_type").contains("ck").alias("s_contains"),
        F.col("event_type").startswith("cl").alias("s_prefix"),
        F.replace(F.col("event_type"), F.lit("c"), F.lit("C")).alias("s_replace"),
        F.regexp_extract("props", r'"k": (\d+)', 1).alias("r_extract"),
        F.year("time").cast("long").alias("d_year"),
        F.month("time").cast("long").alias("d_month"),
        F.hour("time").cast("long").alias("d_hour"),
        F.minute("time").cast("long").alias("d_minute"),
        F.dayofmonth("time").cast("long").alias("d_dom"),
        (F.dayofweek("time") - 1).cast("long").alias("d_dow_sun0"),
        F.col("f_float").cast("int").cast("long").alias("c_int"),
        F.col("f_float").cast("string").alias("c_str"),
        F.when(F.col("f_float") > 100, "high").otherwise("low").alias("cond_level"),
        F.get_json_object("props", "$.k").cast("long").alias("j_k"),
    )


@q(
    "ts_column_ops",
    """
    SELECT event_id AS point_id,
           epoch_ms(date_trunc('minute', ts)) AS t_min_ms,
           epoch_ms(ts + INTERVAL 30 MINUTE) AS t_shift_ms,
           'greengrass' AS origin,
           value AS value_copy,
           value
    FROM events WHERE event_type <> 'view'
    """,
)
def ts_column_ops(spark, sf_dir):
    """Column operators: rename / truncateTimeColumn / timeShift / set /
    duplicate / keep / filter — one pipeline."""
    p = _pts(spark, sf_dir)
    p = ops.filter_expr(p, F.col("event_type") != "view")
    p = ops.rename(p, {"ingest_seq": "point_id"})
    p = ops.duplicate(p, "f_float", "value_copy")
    p = ops.set_constant(p, "origin", "greengrass")
    trunc = ops.truncate_time(p.withColumn("t_min", F.col("time")), "minute", time_col="t_min")
    # shifting a *copy* of the time column — the authoritative time_ns
    # must not move with it
    shifted = ops.time_shift(
        trunc.withColumn("t_shift", F.col("time")), "30 MINUTE",
        time_col="t_shift", time_ns_col=None,
    )
    kept = ops.keep(
        shifted, ["point_id", "t_min", "t_shift", "origin", "value_copy", "f_float"]
    )
    return kept.select(
        "point_id",
        F.unix_millis("t_min").alias("t_min_ms"),
        F.unix_millis("t_shift").alias("t_shift_ms"),
        "origin",
        "value_copy",
        F.col("f_float").alias("value"),
    )


# ------------------------------------------------------------ series ranks

@q(
    "ts_highest_average",
    """
    WITH per AS (
      SELECT user_id, cast(sum(cast(value as decimal(12,2))) as double) / count(*) AS avg_v
      FROM events GROUP BY 1),
    keep AS (
      SELECT user_id FROM per ORDER BY avg_v DESC, user_id ASC LIMIT 3)
    SELECT e.user_id, count(*) AS n,
           cast(sum(cast(e.value as decimal(12,2))) as double) AS sum_value
    FROM events e JOIN keep k ON e.user_id = k.user_id
    GROUP BY 1
    """,
)
def ts_highest_average(spark, sf_dir):
    """highestAverage(n:3): rank whole series (user_id) by mean, keep the
    top 3 series' rows (broadcast semi-join back), then aggregate."""
    p = _pts(spark, sf_dir).withColumn(
        "_avg_exact",
        F.col("f_float").cast("decimal(12,2)"),
    )
    # deterministic rank: decimal-exact mean via sum/cast/count
    per = p.groupBy("user_id").agg(
        (F.sum("_avg_exact").cast("double") / F.count(F.lit(1))).alias("avg_v")
    )
    # orderBy+limit → TakeOrderedAndProject, no single-partition window
    # even at high series cardinality (r10, verdict r9 #3)
    keep = (
        per.orderBy(F.desc("avg_v"), F.asc("user_id"))
        .limit(3)
        .select("user_id")
    )
    kept = p.join(F.broadcast(keep), "user_id", "left_semi")
    return kept.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("f_float").cast("decimal(12,2)")).cast("double").alias("sum_value"),
    )


# ------------------------------------------------------------- histograms

@q(
    "ts_histogram",
    """
    WITH bounds AS (SELECT unnest([50.0, 100.0, 150.0, 200.0, 1e9]) AS le),
    et AS (SELECT DISTINCT event_type FROM events),
    c AS (
      SELECT e.event_type, b.le, count(ev.value) AS cnt
      FROM et e CROSS JOIN bounds b
      LEFT JOIN events ev ON ev.event_type = e.event_type AND ev.value <= b.le
      GROUP BY 1, 2)
    SELECT event_type, le, cnt AS count FROM c
    """,
)
def ts_histogram(spark, sf_dir):
    """histogram(bins:): cumulative counts per upper bound per series."""
    p = _pts(spark, sf_dir)
    h = ops.histogram(p, [50.0, 100.0, 150.0, 200.0, 1e9], by=["event_type"])
    return h.select("event_type", "le", F.col("count").cast("long").alias("count"))


@q(
    "ts_histogram_quantile",
    """
    WITH bounds AS (SELECT unnest([50.0, 100.0, 150.0, 200.0, 1e9]) AS le),
    et AS (SELECT DISTINCT event_type FROM events),
    c AS (
      SELECT e.event_type, b.le, count(ev.value) AS cnt
      FROM et e CROSS JOIN bounds b
      LEFT JOIN events ev ON ev.event_type = e.event_type AND ev.value <= b.le
      GROUP BY 1, 2),
    x AS (
      SELECT event_type, le, cnt,
             max(cnt) OVER (PARTITION BY event_type) AS total,
             coalesce(lag(cnt) OVER (PARTITION BY event_type ORDER BY le), 0) AS prev_cnt,
             coalesce(lag(le) OVER (PARTITION BY event_type ORDER BY le), 0.0) AS prev_le
      FROM c)
    SELECT event_type,
           round(prev_le + (le - prev_le) * ((0.9 * total - prev_cnt) / (cnt - prev_cnt)), 9) AS value
    FROM x WHERE cnt >= 0.9 * total AND prev_cnt < 0.9 * total
    """,
)
def ts_histogram_quantile(spark, sf_dir):
    """histogramQuantile(0.9) over the cumulative histogram."""
    p = _pts(spark, sf_dir)
    h = ops.histogram(p, [50.0, 100.0, 150.0, 200.0, 1e9], by=["event_type"])
    hq = ops.histogram_quantile(h, 0.9, by=["event_type"])
    # round(9): the lerp is one fused-multiply-add away from the oracle
    return hq.withColumn("value", F.round("value", 9))


# ----------------------------------------------------- technical indicators

@q(
    "ts_kaufmans_er",
    f"""
    WITH d AS (
      SELECT event_id, event_type,
             abs(value - lag(value, 10) OVER w) AS change,
             abs(value - lag(value, 1) OVER w) AS vs
      FROM events WINDOW w AS (PARTITION BY event_type ORDER BY {SQL_ORDER})),
    v AS (
      SELECT event_id, event_type, change,
             sum(vs) OVER (PARTITION BY event_type ORDER BY event_id
                           ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS vol,
             count(vs) OVER (PARTITION BY event_type ORDER BY event_id
                           ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS nvs
      FROM d)
    SELECT event_id, event_type, round(change / vol, 9) AS ker
    FROM v WHERE change IS NOT NULL AND vol IS NOT NULL
    """,
)
def ts_kaufmans_er(spark, sf_dir):
    """kaufmansER(n:10): |Δ_n| / Σ|Δ_1| over the trailing n rows.

    round(9): the 10-term float sum is not associativity-safe across
    engines at full precision.
    """
    p = _pts(spark, sf_dir)
    k = ops.kaufmans_er(p, 10, by=["event_type"], time_ns=ORDER)
    return k.select(
        F.col("ingest_seq").alias("event_id"),
        "event_type",
        F.round("ker", 9).alias("ker"),
    )


@q(
    "ts_chande_momentum",
    f"""
    WITH d AS (
      SELECT event_id, event_type,
             cast(value as decimal(12,2)) - lag(cast(value as decimal(12,2))) OVER w AS delta
      FROM events WINDOW w AS (PARTITION BY event_type ORDER BY {SQL_ORDER})),
    s AS (
      SELECT event_id, event_type,
             sum(CASE WHEN delta > 0 THEN delta ELSE cast(0 as decimal(12,2)) END)
               OVER wn AS su,
             sum(CASE WHEN delta < 0 THEN -delta ELSE cast(0 as decimal(12,2)) END)
               OVER wn AS sd,
             sum(CASE WHEN delta IS NOT NULL THEN 1 ELSE 0 END) OVER wn AS nvalid
      FROM d
      WINDOW wn AS (PARTITION BY event_type ORDER BY event_id
                    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
    SELECT event_id, event_type,
           100.0 * cast(su - sd as double) / cast(su + sd as double) AS cmo
    FROM s WHERE nvalid >= 10
    """,
)
def ts_chande_momentum(spark, sf_dir):
    """chandeMomentumOscillator(n:10) — decimal-exact up/down sums."""
    from pyspark.sql import Window as W

    p = _pts(spark, sf_dir)
    w = W.partitionBy("event_type").orderBy("time_ns", "ingest_seq")
    wn = W.partitionBy("event_type").orderBy("ingest_seq").rowsBetween(-9, 0)
    delta = F.col("_vdec") - F.lag("_vdec").over(w)
    zero = F.lit(0).cast("decimal(12,2)")
    d = (
        p.withColumn("_vdec", F.col("f_float").cast("decimal(12,2)"))
        .withColumn("_delta", delta)
        .withColumn("_up", F.when(F.col("_delta") > 0, F.col("_delta")).otherwise(zero))
        .withColumn("_dn", F.when(F.col("_delta") < 0, -F.col("_delta")).otherwise(zero))
        .withColumn("_cnt", F.when(F.col("_delta").isNotNull(), 1).otherwise(0))
    )
    su, sd = F.sum("_up").over(wn), F.sum("_dn").over(wn)
    nvalid = F.sum("_cnt").over(wn)
    return (
        d.withColumn("cmo", 100.0 * (su - sd).cast("double") / (su + sd).cast("double"))
        .withColumn("_nv", nvalid)
        .filter(F.col("_nv") >= 10)
        .select(F.col("ingest_seq").alias("event_id"), "event_type", "cmo")
    )


# ----------------------------------------------------- recursive family
# Recursions are oracled with DuckDB list_reduce: a strict sequential
# left fold, bit-identical to the explicit loops in operators/analytics
# (verified: folds, prefix-array cumsums, and pair accumulators all
# match numpy/python float-for-float; DuckDB *window* SUM does NOT —
# it aggregates tree-wise — hence the fold-over-prefix-array shape).

# fold expression for one EMA step, k = 2/(n+1) with n = 10
_EMA_FOLD = "(acc, x) -> acc + (2.0/11.0) * (x - acc)"
# seed = sequential sum of first 10 values / 10
_EMA_SEED = "list_reduce(pre[1:10], (a, b) -> a + b) / 10.0"

EMA_SQL = f"""
    WITH p AS (
      SELECT event_id, event_type,
             row_number() OVER w AS rn,
             array_agg(value) OVER (PARTITION BY event_type ORDER BY {SQL_ORDER}
                                    ROWS UNBOUNDED PRECEDING) AS pre
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY {SQL_ORDER})
    )
    SELECT event_id, event_type, round(ema, 6) AS ema FROM (
      SELECT event_id, event_type,
             CASE WHEN rn >= 10 THEN list_reduce(
               list_prepend({_EMA_SEED}, pre[11:rn]), {_EMA_FOLD}) END AS ema
      FROM p)
    WHERE ema IS NOT NULL
    """


@q("ts_ema", EMA_SQL)
def ts_ema(spark, sf_dir):
    """exponentialMovingAverage(n:10) — recursive pandas fold per
    series (mapInPandas scaffold since r15); oracled via DuckDB
    sequential-fold (see EMA_SQL)."""
    p = _pts(spark, sf_dir)
    e = ops.exponential_moving_average(p, 10, by=["event_type"])
    return e.filter(F.col("ema").isNotNull()).select(
        F.col("ingest_seq").alias("event_id"), "event_type", F.round("ema", 6).alias("ema")
    )


@q(
    "ts_double_ema",
    f"""
    WITH p AS (
      SELECT event_id, event_type, ts,
             row_number() OVER w AS rn,
             array_agg(value) OVER (PARTITION BY event_type ORDER BY {SQL_ORDER}
                                    ROWS UNBOUNDED PRECEDING) AS pre
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY {SQL_ORDER})
    ),
    e1 AS (
      SELECT event_id, event_type, ts,
             CASE WHEN rn >= 10 THEN list_reduce(
               list_prepend({_EMA_SEED}, pre[11:rn]), {_EMA_FOLD}) END AS e1
      FROM p
    ),
    p2 AS (
      SELECT event_id, event_type, e1,
             row_number() OVER w2 AS rn2,
             array_agg(e1) OVER (PARTITION BY event_type ORDER BY {SQL_ORDER}
                                 ROWS UNBOUNDED PRECEDING) AS pre
      FROM e1 WHERE e1 IS NOT NULL
      WINDOW w2 AS (PARTITION BY event_type ORDER BY {SQL_ORDER})
    )
    SELECT event_id, event_type, round(2 * e1 - e2, 6) AS dema FROM (
      SELECT event_id, event_type, e1,
             CASE WHEN rn2 >= 10 THEN list_reduce(
               list_prepend({_EMA_SEED}, pre[11:rn2]), {_EMA_FOLD}) END AS e2
      FROM p2)
    WHERE e2 IS NOT NULL
    """,
)
def ts_double_ema(spark, sf_dir):
    """doubleEMA(n:10) = 2·EMA − EMA(EMA)."""
    p = _pts(spark, sf_dir)
    e = ops.double_ema(p, 10, by=["event_type"])
    return e.select(
        F.col("ingest_seq").alias("event_id"), "event_type", F.round("dema", 6).alias("dema")
    )


@q(
    "ts_triple_ema",
    f"""
    WITH p AS (
      SELECT event_id, event_type, ts,
             row_number() OVER w AS rn,
             array_agg(value) OVER (PARTITION BY event_type ORDER BY {SQL_ORDER}
                                    ROWS UNBOUNDED PRECEDING) AS pre
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY {SQL_ORDER})
    ),
    e1 AS (
      SELECT event_id, event_type, ts,
             CASE WHEN rn >= 10 THEN list_reduce(
               list_prepend({_EMA_SEED}, pre[11:rn]), {_EMA_FOLD}) END AS e1
      FROM p
    ),
    p2 AS (
      SELECT event_id, event_type, ts, e1,
             row_number() OVER w2 AS rn2,
             array_agg(e1) OVER (PARTITION BY event_type ORDER BY {SQL_ORDER}
                                 ROWS UNBOUNDED PRECEDING) AS pre
      FROM e1 WHERE e1 IS NOT NULL
      WINDOW w2 AS (PARTITION BY event_type ORDER BY {SQL_ORDER})
    ),
    e2 AS (
      SELECT event_id, event_type, ts, e1,
             CASE WHEN rn2 >= 10 THEN list_reduce(
               list_prepend({_EMA_SEED}, pre[11:rn2]), {_EMA_FOLD}) END AS e2
      FROM p2
    ),
    p3 AS (
      SELECT event_id, event_type, e1, e2,
             row_number() OVER w3 AS rn3,
             array_agg(e2) OVER (PARTITION BY event_type ORDER BY {SQL_ORDER}
                                 ROWS UNBOUNDED PRECEDING) AS pre
      FROM e2 WHERE e2 IS NOT NULL
      WINDOW w3 AS (PARTITION BY event_type ORDER BY {SQL_ORDER})
    )
    SELECT event_id, event_type, round(3 * e1 - 3 * e2 + e3, 6) AS tema FROM (
      SELECT event_id, event_type, e1, e2,
             CASE WHEN rn3 >= 10 THEN list_reduce(
               list_prepend({_EMA_SEED}, pre[11:rn3]), {_EMA_FOLD}) END AS e3
      FROM p3)
    WHERE e3 IS NOT NULL
    """,
)
def ts_triple_ema(spark, sf_dir):
    """tripleEMA(n:10) = 3·EMA − 3·EMA² + EMA³ (three stacked folds)."""
    p = _pts(spark, sf_dir)
    e = ops.triple_ema(p, 10, by=["event_type"])
    return e.select(
        F.col("ingest_seq").alias("event_id"), "event_type", F.round("tema", 6).alias("tema")
    )


@q(
    "ts_rsi",
    f"""
    WITH d AS (
      SELECT event_id, event_type, ts,
             value - lag(value) OVER w AS dl,
             row_number() OVER w AS rn
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY {SQL_ORDER})
    ),
    u AS (
      SELECT event_id, event_type, rn,
             array_agg(CASE WHEN dl > 0.0 THEN dl ELSE 0.0 END) OVER w2 AS ups,
             array_agg(CASE WHEN dl < 0.0 THEN -dl ELSE 0.0 END) OVER w2 AS dns
      FROM d WHERE dl IS NOT NULL
      WINDOW w2 AS (PARTITION BY event_type ORDER BY {SQL_ORDER}
                    ROWS UNBOUNDED PRECEDING)
    )
    SELECT event_id, event_type, round(rsi, 6) AS rsi FROM (
      SELECT event_id, event_type,
        CASE WHEN rn >= 15 THEN
          CASE WHEN list_reduce(dns, (acc, x) -> acc + (1.0/14.0) * (x - acc)) = 0.0
               THEN 100.0
               ELSE 100.0 - 100.0 / (1.0 +
                      list_reduce(ups, (acc, x) -> acc + (1.0/14.0) * (x - acc))
                    / list_reduce(dns, (acc, x) -> acc + (1.0/14.0) * (x - acc)))
          END
        END AS rsi
      FROM u)
    WHERE rsi IS NOT NULL
    """,
)
def ts_rsi(spark, sf_dir):
    """relativeStrengthIndex(n:14) — Wilder smoothing (recursive)."""
    p = _pts(spark, sf_dir)
    r = ops.relative_strength_index(p, 14, by=["event_type"])
    return r.filter(F.col("rsi").isNotNull()).select(
        F.col("ingest_seq").alias("event_id"), "event_type", F.round("rsi", 6).alias("rsi")
    )


@q(
    "ts_kama",
    f"""
    WITH b AS (
      SELECT event_id, event_type, ts, value,
             row_number() OVER w AS rn,
             abs(value - lag(value) OVER w) AS dabs,
             lag(value, 10) OVER w AS vlag
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY {SQL_ORDER})
    ),
    c AS (  -- sequential |Δ| cumsum (leading 0.0 for the first row)
      SELECT *, list_reduce(array_agg(coalesce(dabs, 0.0)) OVER w2, (a, x) -> a + x) AS cs
      FROM b
      WINDOW w2 AS (PARTITION BY event_type ORDER BY {SQL_ORDER}
                    ROWS UNBOUNDED PRECEDING)
    ),
    s AS (
      SELECT *, lag(cs, 10) OVER (PARTITION BY event_type ORDER BY {SQL_ORDER}) AS cs10,
             max(CASE WHEN rn = 10 THEN value END) OVER (PARTITION BY event_type) AS seed
      FROM c
    ),
    e AS (
      SELECT *,
        CASE WHEN (cs - cs10) != 0.0
             THEN (abs(value - vlag) / (cs - cs10)) * (2.0/3.0 - 2.0/31.0) + 2.0/31.0
             ELSE 0.0 * (2.0/3.0 - 2.0/31.0) + 2.0/31.0 END AS scb
      FROM s WHERE rn >= 11
    ),
    f AS (
      SELECT event_id, event_type, rn, seed,
             array_agg([scb * scb, value]) OVER (
               PARTITION BY event_type ORDER BY {SQL_ORDER}
               ROWS UNBOUNDED PRECEDING) AS pairs
      FROM e
    )
    SELECT event_id, event_type, round(kama, 6) AS kama FROM (
      SELECT event_id, event_type,
             list_reduce(list_prepend([seed, 0.0], pairs),
               (acc, x) -> [acc[1] + x[1] * (x[2] - acc[1]), 0.0])[1] AS kama
      FROM f)
    WHERE kama IS NOT NULL
    """,
)
def ts_kama(spark, sf_dir):
    """kaufmansAMA(n:10) — recursive adaptive moving average. The seed
    row (rn = n) starts the recursion but is not emitted (r15, stock
    emission: m − n rows per the Flux doc example)."""
    p = _pts(spark, sf_dir)
    k = ops.kaufmans_ama(p, 10, by=["event_type"])
    return k.filter(F.col("kama").isNotNull()).select(
        F.col("ingest_seq").alias("event_id"), "event_type", F.round("kama", 6).alias("kama")
    )


@q(
    "ts_holt_winters",
    """
    WITH agg AS (
      SELECT event_type,
             list(value ORDER BY ts, event_id) AS vs,
             max(epoch_us(ts) * 1000) AS t0
      FROM events GROUP BY event_type
    ),
    fit AS (  -- fold carries [level, trend]; α = β = 0.5
      SELECT event_type, t0,
        list_reduce(
          list_prepend([vs[1], vs[2] - vs[1]],
                       list_transform(vs[2:], y -> [y, 0.0])),
          (acc, x) -> [0.5 * x[1] + 0.5 * (acc[1] + acc[2]),
                       0.5 * ((0.5 * x[1] + 0.5 * (acc[1] + acc[2])) - acc[1])
                         + 0.5 * acc[2]]
        ) AS lt
      FROM agg
    )
    SELECT event_type,
           (t0 + i * 3600000000000) // 1000000 AS t_ms,
           round(lt[1] + i * lt[2], 6) AS hw
    FROM fit CROSS JOIN (SELECT unnest(range(1, 7)) AS i)
    """,
)
def ts_holt_winters(spark, sf_dir):
    """holtWinters(n:6, interval:1h): 6 forecast points per series."""
    p = _pts(spark, sf_dir)
    h = ops.holt_winters(p, 6, 3600, by=["event_type"])
    return h.select(
        "event_type", F.expr("time_ns div 1000000").alias("t_ms"), F.round("hw", 6).alias("hw")
    )


@q(
    "ts_sample",
    f"""
    SELECT event_id, event_type FROM (
      SELECT event_id, event_type,
             row_number() OVER (PARTITION BY event_type ORDER BY {SQL_ORDER}) AS rn
      FROM events)
    WHERE (rn - 1) % 10 = 3
    """,
)
def ts_sample(spark, sf_dir):
    """Flux sample(n:10, pos:3): every 10th row per series starting at
    offset 3 — deterministic (the InfluxQL random SAMPLE stays available
    via pos=-1; RNG streams are engine-specific so only the Flux form is
    oracled)."""
    p = _pts(spark, sf_dir)
    s = ops.sample(p, 10, by=["event_type"], pos=3)
    return s.select(F.col("ingest_seq").alias("event_id"), "event_type")


@q(
    "ts_quantile_selector",
    """
    WITH r AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value ASC) rk,
             count(*) OVER (PARTITION BY event_type) n
      FROM events)
    SELECT event_type, value AS q90
    FROM r WHERE rk = greatest(1, cast(ceil(0.9 * n) as bigint))
    """,
)
def ts_quantile_selector(spark, sf_dir):
    """quantile(0.9, method: exact_selector) — the data point at rank
    ⌈q·n⌉ per series (selector semantics: a value that exists)."""
    p = _pts(spark, sf_dir)
    return ops.quantile(p, 0.9, method="exact_selector", by=["event_type"], alias="q90")


@q(
    "ts_asof_join",
    """
    SELECT c.event_id, c.user_id, c.value AS click_value,
           e.value AS last_error_value,
           epoch_ms(e.ts) AS last_error_ms
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON c.user_id = e.user_id AND c.ts >= e.ts
    """,
)
def ts_asof_join(spark, sf_dir):
    """As-of join: each click gets the user's most recent error at or
    before it (union + forward-fill plan — one shuffle, no range-join
    explosion; SURVEY.md §2.2.3 extension)."""
    p = _pts(spark, sf_dir)
    clicks = p.filter(F.col("event_type") == "click")
    errors = p.filter(F.col("event_type") == "error").select(
        "user_id", "time_ns", F.col("f_float").alias("err_value")
    )
    j = ops.asof_join(
        clicks, errors, on=["user_id"], value_cols=["err_value"]
    )
    return j.select(
        F.col("ingest_seq").alias("event_id"),
        "user_id",
        F.col("f_float").alias("click_value"),
        F.col("err_value_right").alias("last_error_value"),
        F.expr("asof_time_ns div 1000000").alias("last_error_ms"),
    )


@q(
    "ts_session_window",
    """
    WITH d AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 2 HOUR
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
    s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS sid
          FROM d)
    SELECT user_id,
           epoch_ms(min(ts)) AS start_ms,
           epoch_ms(max(ts) + INTERVAL 2 HOUR) AS end_ms,
           count(*) AS n_events,
           cast(sum(cast(value as decimal(12,2))) as double) AS sum_value
    FROM s GROUP BY user_id, sid
    """,
)
def ts_session_window(spark, sf_dir):
    """Event sessionization (native F.session_window — batch AND
    streaming-capable): per-user sessions with a 2h inactivity gap;
    an event exactly at the gap boundary merges (Spark semantics — the
    gaps-and-islands oracle breaks strictly after the gap). Decimal
    sums keep float parity."""
    pts = _pts(spark, sf_dir)
    out = ops.session_window(
        pts, "2h", by=("user_id",),
        extra_aggs=[
            F.sum(F.col("f_float").cast("decimal(12,2)"))
            .cast("double").alias("sum_value")
        ],
    )
    return out.select(
        "user_id",
        F.unix_millis("session_start").alias("start_ms"),
        F.unix_millis("session_end").alias("end_ms"),
        "n_events",
        "sum_value",
    )


@q(
    "ts_trix",
    f"""
    WITH p AS (
      SELECT event_id, event_type, ts,
             row_number() OVER w AS rn,
             array_agg(value) OVER (PARTITION BY event_type ORDER BY {SQL_ORDER}
                                    ROWS UNBOUNDED PRECEDING) AS pre
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY {SQL_ORDER})
    ),
    e1 AS (
      SELECT event_id, event_type, ts,
             CASE WHEN rn >= 10 THEN list_reduce(
               list_prepend({_EMA_SEED}, pre[11:rn]), {_EMA_FOLD}) END AS e1
      FROM p
    ),
    p2 AS (
      SELECT event_id, event_type, ts,
             row_number() OVER w2 AS rn2,
             array_agg(e1) OVER (PARTITION BY event_type ORDER BY {SQL_ORDER}
                                 ROWS UNBOUNDED PRECEDING) AS pre
      FROM e1 WHERE e1 IS NOT NULL
      WINDOW w2 AS (PARTITION BY event_type ORDER BY {SQL_ORDER})
    ),
    e2 AS (
      SELECT event_id, event_type, ts,
             CASE WHEN rn2 >= 10 THEN list_reduce(
               list_prepend({_EMA_SEED}, pre[11:rn2]), {_EMA_FOLD}) END AS e2
      FROM p2
    ),
    p3 AS (
      SELECT event_id, event_type, ts,
             row_number() OVER w3 AS rn3,
             array_agg(e2) OVER (PARTITION BY event_type ORDER BY {SQL_ORDER}
                                 ROWS UNBOUNDED PRECEDING) AS pre
      FROM e2 WHERE e2 IS NOT NULL
      WINDOW w3 AS (PARTITION BY event_type ORDER BY {SQL_ORDER})
    ),
    e3 AS (
      SELECT event_id, event_type, ts,
             CASE WHEN rn3 >= 10 THEN list_reduce(
               list_prepend({_EMA_SEED}, pre[11:rn3]), {_EMA_FOLD}) END AS e3
      FROM p3
    ),
    l AS (
      SELECT event_id, event_type, e3,
             lag(e3) OVER (PARTITION BY event_type ORDER BY {SQL_ORDER}) AS pe
      FROM e3 WHERE e3 IS NOT NULL
    )
    SELECT event_id, event_type, round((e3 - pe) / pe * 100.0, 6) AS trix
    FROM l WHERE pe IS NOT NULL
    """,
)
def ts_trix(spark, sf_dir):
    """tripleExponentialDerivative(n:10) — TRIX: percent change of the
    triple-smoothed EMA (three stacked sequential folds + a lag),
    oracled with the same DuckDB list_reduce chain as the EMA family."""
    p = _pts(spark, sf_dir)
    t = ops.triple_exponential_derivative(p, 10, by=["event_type"])
    return t.select(
        F.col("ingest_seq").alias("event_id"), "event_type",
        F.round("trix", 6).alias("trix"),
    )


@q(
    "ts_hour_selection",
    f"""
    SELECT event_type, count(*) AS n, {DEC_SUM} / count(*) AS mean_value
    FROM events
    WHERE (({SQL_TNS}) // 3600000000000) % 24 BETWEEN 9 AND 17
    GROUP BY 1
    """,
)
def ts_hour_selection(spark, sf_dir):
    """hourSelection(start:9, stop:17) — business-hours filter via
    integer epoch-ns arithmetic (codegen-friendly, composes with the
    range() pushdown), then a per-series mean."""
    p = _pts(spark, sf_dir)
    h = ops.hour_selection(p, 9, 17)
    return h.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.col("f_float").cast("decimal(12,2)")).cast("double")
         / F.count(F.lit(1))).alias("mean_value"),
    )


@q(
    "ts_time_weighted_avg",
    f"""
    WITH d AS (
      SELECT event_type,
             cast(round(value * 100) as bigint) AS wv,
             lag(cast(round(value * 100) as bigint)) OVER w AS pwv,
             {SQL_TNS} AS tns,
             {SQL_TNS} - lag({SQL_TNS}) OVER w AS dt_ns
      FROM events WINDOW w AS (PARTITION BY event_type ORDER BY {SQL_ORDER}))
    SELECT event_type,
           round(cast(sum((wv + pwv) * dt_ns) as double)
             / cast(max(tns) - min(tns) as double) / 200.0, 6) AS twa
    FROM d GROUP BY 1
    """,
)
def ts_time_weighted_avg(spark, sf_dir):
    """timeWeightedAvg() — trapezoid integral / total elapsed span per
    series (exact integer area terms ×100×Δns, one double division at
    the end, mirroring the ts_integral parity recipe). Same plan shape
    as operators.aggregates.time_weighted_avg: lag window + single
    hash aggregate."""
    from pyspark.sql import Window as W

    p = _pts(spark, sf_dir)
    w = W.partitionBy("event_type").orderBy("time_ns", "ingest_seq")
    wv = F.round(F.col("f_float") * 100).cast("long")
    d = (
        p.withColumn("_wv", wv)
        .withColumn("_pwv", F.lag("_wv").over(w))
        .withColumn("_dt", F.col("time_ns") - F.lag("time_ns").over(w))
    )
    area = ((F.col("_wv") + F.col("_pwv")) * F.col("_dt")).cast("decimal(38,0)")
    span = (F.max("time_ns") - F.min("time_ns")).cast("double")
    # 6dp round on both sides: DuckDB's HUGEINT→double cast can land
    # 1 ulp off Spark's decimal→double (see ts_integral)
    return d.groupBy("event_type").agg(
        F.round(F.sum(area).cast("double") / span / F.lit(200.0), 6).alias("twa")
    )


@q(
    "ts_deadman",
    """
    WITH f AS (
      SELECT event_type, ts FROM events
      WHERE value > 190
        AND ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-31'),
    grid AS (
      SELECT g AS wstart
      FROM generate_series(TIMESTAMP '2024-01-01 00:00:00',
                           TIMESTAMP '2024-01-30 23:00:00', INTERVAL 1 HOUR) t(g)),
    et AS (SELECT DISTINCT event_type FROM f),
    agg AS (
      SELECT event_type, time_bucket(INTERVAL 1 HOUR, ts) AS wstart, count(*) AS n
      FROM f GROUP BY 1, 2)
    SELECT et.event_type, epoch_ms(grid.wstart) AS w_ms,
           coalesce(agg.n, 0) AS n,
           CAST(coalesce(agg.n, 0) = 0 AS INT) AS dead
    FROM et CROSS JOIN grid
    LEFT JOIN agg ON agg.event_type = et.event_type AND agg.wstart = grid.wstart
    """,
)
def ts_deadman(spark, sf_dir):
    """monitor.deadman over a sparse signal (value > 190): per
    (series × hour) windows flagged dead when no points arrived —
    the InfluxDB alerting primitive, built from window-count + the
    createEmpty spine (spine size ∝ |series|×|windows|, not data)."""
    p = _pts(spark, sf_dir)
    r = ops.push_time_filter(p, RANGE_START_NS, RANGE_STOP_NS)
    rare = r.filter(F.col("f_float") > 190)
    d = ops.deadman(rare, HOUR_NS, RANGE_START_NS, RANGE_STOP_NS, by=["event_type"])
    return d.select(
        "event_type", _w_ms().alias("w_ms"), "n",
        F.col("dead").cast("int").alias("dead"),
    )


@q(
    "ts_funnel",
    """
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY 1),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
    SELECT 1 AS step, (SELECT count(*) FROM s1) AS n_users
    UNION ALL SELECT 2, (SELECT count(*) FROM s2)
    UNION ALL SELECT 3, (SELECT count(*) FROM s3)
    """,
)
def ts_funnel(spark, sf_dir):
    """Ordered funnel over the event stream: users whose first signup
    precedes a later click precedes a later purchase — per-step user
    counts. Each step is one groupBy(user) min + a user-keyed join of
    the next event type; the user key partitions every stage, so the
    chain is three co-partitioned shuffles (AQE reuses the exchange),
    never a per-user Python loop."""
    p = _pts(spark, sf_dir)
    s1 = (p.filter(F.col("event_type") == "signup")
          .groupBy("user_id").agg(F.min("time_ns").alias("t1")))
    s2 = (p.filter(F.col("event_type") == "click")
          .join(s1, "user_id").filter(F.col("time_ns") > F.col("t1"))
          .groupBy("user_id").agg(F.min("time_ns").alias("t2")))
    s3 = (p.filter(F.col("event_type") == "purchase")
          .join(s2, "user_id").filter(F.col("time_ns") > F.col("t2"))
          .groupBy("user_id").agg(F.min("time_ns").alias("t3")))
    rows = None
    for i, s in enumerate((s1, s2, s3), start=1):
        one = s.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i).alias("step"), "n_users"
        )
        rows = one if rows is None else rows.unionByName(one)
    return rows


WEEK_NS = 7 * 86400 * 10**9


@q(
    "ts_cohort_retention",
    f"""
    WITH act AS (
      SELECT DISTINCT user_id, epoch_ns(ts) // {WEEK_NS} AS week
      FROM events),
    first AS (
      SELECT user_id, min(week) AS cohort_week FROM act GROUP BY 1)
    SELECT f.cohort_week, a.week - f.cohort_week AS week_offset,
           count(DISTINCT a.user_id) AS n_users
    FROM act a JOIN first f ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
)
def ts_cohort_retention(spark, sf_dir):
    """Cohort retention triangle: users grouped by first-active week,
    counted per later active week. Two user-keyed aggregations and one
    co-partitioned join — the classic engagement query an analytics
    engine over event streams must serve."""
    p = _pts(spark, sf_dir)
    act = p.select(
        "user_id", F.expr(f"time_ns div {WEEK_NS}").alias("week")
    ).distinct()
    first = act.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        act.join(first, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@q(
    "ts_mad_outliers",
    """
    WITH med AS (
      SELECT event_type, median(value) AS med FROM events GROUP BY 1),
    dev AS (
      SELECT e.event_type, e.ts, e.value, m.med,
             abs(e.value - m.med) AS adev
      FROM events e JOIN med m ON m.event_type = e.event_type),
    mad AS (
      SELECT event_type, median(adev) AS mad FROM dev GROUP BY 1)
    SELECT d.event_type, epoch_ms(d.ts) AS t_ms, d.value,
           round(d.adev / m.mad, 6) AS mad_score
    FROM dev d JOIN mad m ON m.event_type = d.event_type
    WHERE d.adev > 6 * m.mad
    """,
)
def ts_mad_outliers(spark, sf_dir):
    """Robust per-series outlier detection: |x − median| > 6·MAD
    (median absolute deviation — immune to the outliers it hunts,
    unlike stddev). Two exact-median aggregations per series key plus
    one broadcastable stats join; the raw scan streams through the
    flag filter without re-shuffling."""
    p = _pts(spark, sf_dir)
    med = p.groupBy("event_type").agg(F.median("f_float").alias("med"))
    dev = p.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("f_float") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.median("adev").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("adev") > 6 * F.col("mad"))
        .select(
            "event_type",
            F.expr("time_ns div 1000000").alias("t_ms"),
            F.col("f_float").alias("value"),
            F.round(F.col("adev") / F.col("mad"), 6).alias("mad_score"),
        )
    )
