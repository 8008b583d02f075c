"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized (one count action) so the measured
time includes the whole plan execution. Alongside each timing the
output carries the query's physical-plan FINGERPRINT
(plans/fingerprint.py): identical fingerprints between a driver run
and the committed local reference prove any timing delta is
environmental, not a plan regression (VERDICT r5 item 1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the telemetry-dashboard family + relational joins + the
# training-data extension surface. Keep this list in sync with the
# heaviest representative operators, not every suite entry.
HEADLINE = [
    "ts_agg_window_mean",
    "ts_rollup_routed",
    "ts_agg_window_create_empty",
    "ts_window_sliding",
    "ts_interpolate_linear",
    "ts_derivative",
    "ts_cumulative_sum",
    "ts_top3",
    "ts_spread_stats",
    "ts_asof_join",
    "ts_ema",
    "ts_kama",
    "ts_rsi",
    "rel_pricing_summary",
    "rel_region_revenue",
    "rel_supplier_part_agg",
    "ext_dedup_exact",
    "ext_dedup_ngram_jaccard",
    "ext_dedup_minhash_lsh",
    "ext_similarity_topk",
    "ext_similarity_pq",
    "ext_similarity_sq8",
    "ext_text_stats",
    "ext_span_dedup",
    "ext_repetition",
    "ext_unigram_logprob",
    "ext_contamination",
    "ext_train_split",
    "ext_doc_chunks",
    "ext_pack_sequences",
    "ext_dsir_importance",
    "ext_ccnet_buckets",
    "ext_embedding_rp",
    "ext_quality_logreg_train",
    "influxql_count_fill0",
    "influxql_nested_grafana",
    "influxql_show_meta",
    # r14 (VERDICT r13 #3): the first MIXED-type headline row — the
    # r13 slot-tuple machinery (union, variable-bound range, catalog-
    # proved regroup, slot-carrying aggregateWindow, typed min/max)
    # finally has sf0.1 timing coverage
    "bench_mixed_union_selectors",
]


def main() -> None:
    from aws_greengrass_labs_database_influxdb_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="bench")
    qs = entry_mod.queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in qs if n.startswith("bench_") and n not in HEADLINE
    ]

    # Warm the JVM + parquet footers once so per-query times measure the
    # query, not session bootstrap.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in ("lineitem", "events", "documents", "embeddings"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
    # ... and the Python/Arrow worker pool (first applyInPandas pays
    # ~2s of daemon spin-up that is session bootstrap, not query time)
    from pyspark.sql import functions as F

    spark.range(32).withColumn("g", F.expr("id % 4")).groupBy("g").applyInPandas(
        lambda p: p, schema="id long, g long"
    ).count()

    from aws_greengrass_labs_database_influxdb_spark.plans.fingerprint import plan_fingerprint

    timings: dict[str, float] = {}
    plans: dict[str, dict] = {}
    for name in names:
        # steady-state latency: best of 2 runs. The first execution of a
        # query pays one-off costs (shuffle-file creation, codegen JIT)
        # that belong to the session, not the plan; host-level noise in
        # this environment is also ±2x, and min-of-2 damps both.
        best, n = None, 0
        for _ in range(2):
            t0 = time.time()
            n = qs[name](spark, SF_DIR).count()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
        # plan shape, recorded OUTSIDE the timed body (planning only —
        # lets any cross-round timing delta be adjudicated as
        # plan-change vs environment by fingerprint equality). The
        # side-effecting maintenance pipelines are excluded:
        # re-constructing them replays their write phase. (r14: the
        # exclusion is the explicit trio, not the bench_ prefix — the
        # read-only bench_mixed_union_selectors gets a fingerprint.)
        if name not in ("bench_rollup_refresh", "bench_cq_run",
                        "bench_skew_window"):
            fp = plan_fingerprint(qs[name](spark, SF_DIR))
            plans[name] = {"fp": fp["fp"], "sh": fp["shuffles"],
                           "cg": fp["codegen"], "py": fp["py_eval"]}
        print(f"# {name}: {n} rows in {timings[name]}s"
              + (f" fp={plans[name]['fp']}" if name in plans else ""),
              file=sys.stderr)

    # Variance sentinel (r10, VERDICT r9 #6; widened r11, VERDICT r10
    # #3): the historically noisiest queries get ONE extra timed run
    # after the sweep. r10's driver regression sat entirely in the
    # disk-bound maintenance trio, which the sentinel did not cover —
    # the environment attribution was argued, not measured. Now the
    # maintenance writers are in, and the noise flag fires at >=1.5x
    # spread on ANY sentinel query (the r10 minhash 1.85x spread
    # passed a 2x threshold as "clean").
    # r12 (VERDICT r11 #6): ts_agg_window_mean added — the widest
    # read-query driver/local gap (1.80x at r11 with identical plans);
    # carrying its spread makes any further drift attributable.
    sentinel = {}
    # r14 (VERDICT r13 #3): bench_mixed_union_selectors added — the
    # first mixed-type row in the headline set; carrying its spread
    # from round one makes any future drift attributable.
    for name in ("ext_quality_logreg_train", "bench_skew_window",
                 "ext_dedup_minhash_lsh", "bench_cq_run",
                 "bench_rollup_refresh", "ts_agg_window_mean",
                 "bench_mixed_union_selectors"):
        if name not in timings:
            continue
        t0 = time.time()
        qs[name](spark, SF_DIR).count()
        again = round(time.time() - t0, 3)
        ratio = round(again / timings[name], 2) if timings[name] else None
        sentinel[name] = {"best": timings[name], "rerun": again,
                          "spread": ratio}
    env_noise = any(
        s["spread"] is not None and s["spread"] >= 1.5
        for s in sentinel.values()
    )

    total = round(sum(timings.values()), 3)
    # split totals: bench_* entries are WRITE/maintenance-path pipelines
    # (rollup refresh, CQ run) added for breadth in r4 — keep the
    # read-query total separately comparable round-over-round.
    read_total = round(
        sum(v for k, v in timings.items() if not k.startswith("bench_")), 3
    )
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    # Per-query plan fingerprints go to a FILE, not stdout: the bench
    # consumer keeps only a bounded tail of output, and embedding the
    # full plans dict in the JSON line pushed it past that bound in r6
    # (the line was truncated mid-JSON and never parsed). The printed
    # line carries a single combined digest instead; equality against
    # the committed BENCH_PLANS.json proves plan-shape identity.
    import hashlib

    plans_digest = hashlib.md5(
        json.dumps(plans, sort_keys=True).encode()
    ).hexdigest()[:12]
    plans_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_PLANS.json"
    )
    try:
        with open(plans_path, "w") as f:
            json.dump({"plans_fp": plans_digest, "plans": plans}, f, indent=1,
                      sort_keys=True)
    except OSError as exc:  # read-only checkout: digest still printed
        print(f"# plans file not written: {exc}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "read_queries_total": read_total,
                "maintenance_total": round(total - read_total, 3),
                "queries": timings,
                "variance_sentinel": sentinel,
                "env_noise": env_noise,
                "plans_fp": plans_digest,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
