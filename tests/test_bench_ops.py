"""Maintenance-bench bodies: the timed sections must not launch extra
driver jobs to learn "now"/"latest day" (VERDICT r4) — both come from
parquet footer statistics — and the footer value must agree with the
Spark-computed maximum."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_greengrass_labs_database_influxdb_spark.sources.io import events_points
from aws_greengrass_labs_database_influxdb_spark.suite.bench_ops import (
    _events_max_time_ns,
)


def test_footer_max_matches_spark_max(spark, sf_dir):
    footer = _events_max_time_ns(sf_dir)
    exact = events_points(spark, sf_dir).agg(F.max("time_ns")).first()[0]
    assert footer == exact


def test_footer_max_runs_no_spark_job(spark, sf_dir):
    sc = spark.sparkContext
    before = set(sc.statusTracker().getJobIdsForGroup(None) or [])
    _events_max_time_ns(sf_dir)
    after = set(sc.statusTracker().getJobIdsForGroup(None) or [])
    assert after == before, "footer-stats read launched a Spark job"


def test_bench_bodies_still_produce_rows(spark, sf_dir):
    from aws_greengrass_labs_database_influxdb_spark.suite import QUERIES

    assert QUERIES["bench_cq_run"](spark, sf_dir).count() > 0
    assert QUERIES["bench_rollup_refresh"](spark, sf_dir).count() > 0


def test_skew_window_hot_series_salted_and_recursive_bounded(spark, sf_dir):
    """The skew bench's structural claims: the hot series (~50% of all
    rows) splits across window starts in the hash-agg key (time-salted,
    SCALE.md §windows), and the recursive EMA still emits one value per
    hot row past the seed — the single-group worst case executes."""
    from aws_greengrass_labs_database_influxdb_spark.suite import QUERIES, load_all

    load_all()
    out = QUERIES["bench_skew_window"](spark, sf_dir)
    rows = {r.series: r for r in out.collect()}
    assert "hot" in rows
    hot = rows["hot"]
    # hot series spans many hourly windows — the agg key is salted by
    # time, so no single hash-agg key holds 50% of the corpus
    assert hot.n_windows > 100
    # EMA emitted for every hot row past the 9-row seed window
    from aws_greengrass_labs_database_influxdb_spark.sources.io import events_points
    from pyspark.sql import functions as F

    n_hot = events_points(spark, sf_dir).filter(F.col("user_id") % 2 == 0).count()
    assert hot.n_ema == n_hot - 9
    # and the hot series is the largest group by construction
    assert all(r.n_ema is None or r.n_ema < hot.n_ema
               for s, r in rows.items() if s != "hot")
