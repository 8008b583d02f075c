"""Materialized-downsample routing: serve ``aggregateWindow`` from a
pre-downsampled rollup instead of raw points.

This is the standard InfluxDB operating pattern the reference's data
plane is deployed for: a scheduled task continuously downsamples raw
telemetry (``aggregateWindow |> to()``) and dashboards read the rollup
(SURVEY.md §2.2.9 tasks; §4.2 lists this routing as the one
materialized-view optimization worth owning above Catalyst).

Spark-first design:

- A rollup stores **re-aggregable partials** per (series, window):
  ``_cnt`` (long), ``_sum`` (exact DECIMAL sum), ``_min``/``_max``
  (doubles). Every distributive/algebraic aggregate the window family
  serves — count, sum, min, max, mean = Σsum/Σcnt — re-derives from
  those partials at any coarser granularity. DECIMAL partial sums make
  the two-phase re-aggregation **bit-identical** to a direct
  aggregation (decimal addition is associative; float is not), so
  routing is invisible to correctness gates.
- Routing picks the **coarsest** materialized ``every`` that divides
  the requested ``every`` (epoch-aligned tumbling windows nest exactly
  when the grain divides). A 1-minute rollup answers 5m/1h/1d
  dashboards; the scan shrinks from O(raw points) to O(series ×
  rollup windows) — at 100 TB of raw telemetry that is the difference
  between touching terabytes and touching gigabytes.
- Storage: parquet partitioned by ``_day = _start_ns div 86400e9`` —
  the same day-pruning layout as the bucket store, so a dashboard's
  ``range()`` prunes rollup partitions identically. Rebuilds are
  per-day partition overwrites (idempotent, parallel).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass
from pathlib import Path
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.windows import duration_ns, window_spine, window_start_ns
from ..operators.errors import OperatorValidationError

DAY_NS = 86_400 * 10**9

# fns answerable from rollup partials (Flux aggregateWindow fns)
ROUTABLE_FNS = ("count", "sum", "min", "max", "mean")


def build_rollup(
    df: DataFrame,
    every: str | int,
    by: Sequence[str] = ("measurement", "field"),
    value: str = "f_float",
    time_ns: str = "time_ns",
    sum_dtype: str = "decimal(12,2)",
) -> DataFrame:
    """Partial-aggregate ``df`` into (by…, _start_ns) rollup rows.

    One hash aggregate with map-side combine — the same single-shuffle
    shape as ``aggregate_window`` itself. ``sum_dtype`` controls the
    exact-sum representation (match the data's decimal scale).
    """
    every_n = duration_ns(every)
    start = window_start_ns(F.col(time_ns), every_n)
    return df.groupBy(*by, start.alias("_start_ns")).agg(
        F.count(F.col(value)).alias("_cnt"),
        F.sum(F.col(value).cast(sum_dtype)).alias("_sum"),
        F.min(F.col(value)).alias("_min"),
        F.max(F.col(value)).alias("_max"),
    )


def reaggregate(
    rollup: DataFrame,
    every: str | int,
    fn: str,
    by: Sequence[str] = ("measurement", "field"),
    alias: str | None = None,
    create_empty: bool = False,
    range_start: int | None = None,
    range_stop: int | None = None,
    time_src: str = "_stop",
) -> DataFrame:
    """Roll partials up to a coarser ``every``; mirrors the output shape
    of :func:`..operators.windows.aggregate_window` (``_start_ns``,
    ``_stop_ns``, ``time_ns``, ``time``, value alias)."""
    if fn not in ROUTABLE_FNS:
        raise OperatorValidationError(f"{fn!r} is not derivable from rollup partials")
    every_n = duration_ns(every)
    out_alias = alias or fn
    exprs = {
        "count": lambda: F.sum("_cnt"),
        "sum": lambda: F.sum("_sum").cast("double"),
        "min": lambda: F.min("_min"),
        "max": lambda: F.max("_max"),
        "mean": lambda: F.sum("_sum").cast("double") / F.sum("_cnt"),
    }
    start = window_start_ns(F.col("_start_ns"), every_n)
    grouped = (
        rollup.groupBy(*by, start.alias("_start_ns"))
        .agg(exprs[fn]().alias(out_alias))
        .withColumn("_stop_ns", F.col("_start_ns") + F.lit(every_n))
    )
    if create_empty:
        assert range_start is not None and range_stop is not None
        spine = window_spine(rollup, range_start, range_stop, every_n, by)
        grouped = spine.join(grouped, on=[*by, "_start_ns", "_stop_ns"], how="left")
        if fn == "count":
            # same Flux quirk aggregate_window keeps: count() of an
            # empty window is 0, every other aggregate is null —
            # routing through the rollup must not change the answer
            grouped = grouped.withColumn(
                out_alias, F.coalesce(F.col(out_alias), F.lit(0))
            )
    src = "_stop_ns" if time_src == "_stop" else "_start_ns"
    return (
        grouped.withColumn("time_ns", F.col(src))
        .withColumn("time", F.timestamp_micros(F.expr(f"{src} div 1000")))
    )


def _decimal_prec_scale(sum_dtype: str) -> tuple[int, int]:
    """``decimal(p,s)`` → (p, s); non-decimal types get (inf, inf) —
    they impose no truncation so they satisfy any requirement."""
    m = re.fullmatch(r"\s*decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)\s*", sum_dtype.lower())
    if not m:
        big = 10**9
        return big, big
    return int(m.group(1)), int(m.group(2))


@dataclass
class RollupSpec:
    name: str
    every_ns: int
    by: tuple[str, ...]
    value: str
    sum_dtype: str = "decimal(12,2)"
    # max window stop covered by the materialized data; writes with
    # time_ns >= watermark_ns are NOT reflected in the rollup.
    watermark_ns: int | None = None


class RollupCatalog:
    """Registry + store of materialized rollups for one source bucket.

    ``route()`` answers "can this aggregateWindow be served cheaper?" —
    the planner hook a dashboard path calls before touching raw points.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _dir(self, name: str) -> Path:
        return self.root / name

    # ------------------------------------------------------------- build

    def materialize(
        self,
        name: str,
        points: DataFrame,
        every: str | int,
        by: Sequence[str] = ("measurement", "field"),
        value: str = "f_float",
        sum_dtype: str = "decimal(12,2)",
    ) -> RollupSpec:
        """Full (re)build. Day-partitioned so incremental refreshes can
        overwrite only the days a new batch touches (the downsample
        task's ``foreachBatch`` does exactly that per micro-batch).

        ``sum_dtype`` must be wide enough for the data's decimal scale —
        it is persisted and validated at routing time so a rollup built
        with too-narrow a scale is never silently preferred."""
        every_n = duration_ns(every)
        rp = build_rollup(points, every_n, by, value, sum_dtype=sum_dtype).withColumn(
            "_day", F.expr(f"_start_ns div {DAY_NS}")
        )
        d = self._dir(name)
        # one task → one file per day partition: the rollup comes out
        # of a 32-way aggregate shuffle, and writing that directly
        # sprays tasks×days tiny files (rollup rows per day are few —
        # a single clustered file per day is the right layout, and
        # routed reads list far fewer footers)
        rp = rp.repartition("_day").sortWithinPartitions(*by, "_start_ns")
        rp.write.mode("overwrite").partitionBy("_day").parquet(str(d / "data"))
        # watermark from the written rollup (tiny relative to points):
        # ranges ending past it may include unrolled-up writes → direct.
        max_start = (
            self.spark.read.parquet(str(d / "data")).agg(F.max("_start_ns")).collect()[0][0]
        )
        watermark = (max_start + every_n) if max_start is not None else 0
        spec = RollupSpec(name, every_n, tuple(by), value, sum_dtype, watermark)
        (d / "rollup.json").write_text(json.dumps(spec.__dict__))
        return spec

    def refresh_days(self, name: str, points: DataFrame, days: Sequence[int]) -> None:
        """Incremental maintenance: rebuild only the named day
        partitions from the given (already day-filtered) points —
        partition-overwrite, no full rewrite."""
        spec = self.get(name)
        rp = (
            build_rollup(points, spec.every_ns, spec.by, spec.value, sum_dtype=spec.sum_dtype)
            .withColumn("_day", F.expr(f"_start_ns div {DAY_NS}"))
            .filter(F.col("_day").isin(list(days)))
        )
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # same one-file-per-day clustering as materialize (the refresh
        # rewrites whole day partitions, so layout stays uniform)
        rp = rp.repartition("_day").sortWithinPartitions(*spec.by, "_start_ns")
        rp.write.mode("overwrite").partitionBy("_day").parquet(
            str(self._dir(name) / "data")
        )
        new_wm = (max(days) + 1) * DAY_NS
        if spec.watermark_ns is None or new_wm > spec.watermark_ns:
            spec.watermark_ns = new_wm
            (self._dir(name) / "rollup.json").write_text(json.dumps(spec.__dict__))

    # ------------------------------------------------------------- lookup

    @staticmethod
    def _spec_from_json(m: dict) -> RollupSpec:
        return RollupSpec(
            m["name"],
            m["every_ns"],
            tuple(m["by"]),
            m["value"],
            m.get("sum_dtype", "decimal(12,2)"),
            m.get("watermark_ns"),
        )

    def list_specs(self) -> list[RollupSpec]:
        out = []
        for d in sorted(self.root.iterdir()):
            meta = d / "rollup.json"
            if meta.exists():
                out.append(self._spec_from_json(json.loads(meta.read_text())))
        return out

    def get(self, name: str) -> RollupSpec:
        return self._spec_from_json(
            json.loads((self._dir(name) / "rollup.json").read_text())
        )

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(str(self._dir(name) / "data"))

    def route(
        self,
        every: str | int,
        fn: str,
        by: Sequence[str] = ("measurement", "field"),
        min_sum_dtype: str | None = None,
    ) -> RollupSpec | None:
        """Coarsest materialized rollup that exactly answers
        (every, fn, by): grain divides the request, same group columns,
        fn derivable from partials, and (when ``min_sum_dtype`` is
        given) a partial-sum type at least as wide/precise as required
        — a rollup whose decimal sum would truncate the data is never
        selected. None → fall back to raw points."""
        if fn not in ROUTABLE_FNS:
            return None
        every_n = duration_ns(every)
        candidates = [
            s
            for s in self.list_specs()
            if s.by == tuple(by) and every_n % s.every_ns == 0
        ]
        if min_sum_dtype is not None and fn in ("sum", "mean"):
            need_p, need_s = _decimal_prec_scale(min_sum_dtype)
            candidates = [
                s
                for s in candidates
                if (lambda p, s_: s_ >= need_s and p - s_ >= need_p - need_s)(
                    *_decimal_prec_scale(s.sum_dtype)
                )
            ]
        return max(candidates, key=lambda s: s.every_ns, default=None)

    # ------------------------------------------------------------ execute

    def aggregate_window(
        self,
        points: DataFrame,
        every: str | int,
        fn: str,
        by: Sequence[str] = ("measurement", "field"),
        alias: str | None = None,
        create_empty: bool = False,
        range_start: int | None = None,
        range_stop: int | None = None,
        time_src: str = "_stop",
        min_sum_dtype: str | None = None,
        source_max_time_ns: int | None = None,
    ) -> DataFrame:
        """aggregateWindow with routing: serve from the best rollup when
        one applies (pruning rollup day-partitions by the range), else
        compute directly from ``points``.

        Routing is refused (falls back to the direct path) when it
        could diverge from a direct aggregation:

        - range bounds not aligned to the rollup grain — the boundary
          rollup window straddles the range edge, so its partial can't
          be split; direct would aggregate only the in-range points;
        - ``min_sum_dtype`` wider than the rollup's persisted partial
          sum type (decimal truncation);
        - ``source_max_time_ns`` (the bucket's max write time, when the
          caller knows it) at/past the rollup watermark — writes newer
          than the materialization would be invisible to the rollup.
        """
        from ..operators.windows import aggregate_window as direct

        def fallback():
            # range() filters points on the direct path (the routed path
            # prunes rollup windows by the same bounds)
            pts = points
            if range_start is not None:
                pts = pts.filter(F.col("time_ns") >= range_start)
            if range_stop is not None:
                pts = pts.filter(F.col("time_ns") < range_stop)
            return direct(
                pts, every, fn, by=by, alias=alias, create_empty=create_empty,
                range_start=range_start, range_stop=range_stop, time_src=time_src,
            )

        spec = self.route(every, fn, by, min_sum_dtype=min_sum_dtype)
        if spec is None:
            return fallback()
        for bound in (range_start, range_stop):
            if bound is not None and bound % spec.every_ns != 0:
                return fallback()
        if (
            source_max_time_ns is not None
            and (spec.watermark_ns is None or source_max_time_ns >= spec.watermark_ns)
        ):
            return fallback()
        rp = self.read(spec.name)
        if range_start is not None:
            rp = rp.filter(
                (F.col("_day") >= range_start // DAY_NS) & (F.col("_start_ns") >= range_start)
            )
        if range_stop is not None:
            rp = rp.filter(
                (F.col("_day") <= (range_stop - 1) // DAY_NS) & (F.col("_start_ns") < range_stop)
            )
        return reaggregate(
            rp, every, fn, by=by, alias=alias, create_empty=create_empty,
            range_start=range_start, range_stop=range_stop, time_src=time_src,
        )
