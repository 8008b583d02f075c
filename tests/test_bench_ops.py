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
