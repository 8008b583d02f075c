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


def test_bench_stores_steady_state_rows_stable(spark, sf_dir, tmp_path, monkeypatch):
    """r9 (VERDICT r8 item 8): the maintenance benches keep their bulk
    build behind a validity marker and re-run only the per-cycle work.
    The returned rows must be VALUE-IDENTICAL between the cold (build)
    run and warm (steady-state) runs — and a marker from a different
    sf/generation must force a rebuild, not serve stale rows."""
    import aws_greengrass_labs_database_influxdb_spark.suite.bench_ops as bo

    monkeypatch.setattr(bo, "_BENCH_ROOT", str(tmp_path / "bench"))

    def snap(fn):
        pdf = fn(spark, sf_dir).toPandas()
        cols = sorted(pdf.columns)
        return pdf.reindex(cols, axis=1).sort_values(by=cols).reset_index(drop=True)

    for name in ("bench_cq_run", "bench_rollup_refresh"):
        fn = bo.bench_cq_run if name == "bench_cq_run" else bo.bench_rollup_refresh
        cold = snap(fn)
        warm1 = snap(fn)
        warm2 = snap(fn)
        assert cold.equals(warm1) and cold.equals(warm2), name
    # stale marker (wrong fingerprint) → rebuild path, same rows
    mk = bo._marker_load(f"{bo._BENCH_ROOT}/cqstore")
    assert mk is not None and mk["runs"] == 3
    bo._marker_save(f"{bo._BENCH_ROOT}/cqstore", {**mk, "max_ns": -1})
    rebuilt = snap(bo.bench_cq_run)
    assert rebuilt.equals(snap(bo.bench_cq_run))
    assert bo._marker_load(f"{bo._BENCH_ROOT}/cqstore")["runs"] == 2


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
