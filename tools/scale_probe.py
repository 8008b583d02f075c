"""10× scale probe (VERDICT r5 item 3): run the heaviest suite ops at
sf0.1 and at the 10× upsampled corpus (tools/gen_scale_probe.py), and
record whether measured scaling matches the documented shuffle shapes.

Writes BENCH_SCALE_sf1.json:
  {"ops": {name: {"sf0_1_sec", "sf1_sec", "ratio", "rows_sf0_1",
                  "rows_sf1"}}, "k": 10}

Interpretation guide (SCALE.md §scale-probe): linear ops should show
ratio ≈ K on CPU-bound plans, < K when fixed per-job overhead
dominates at sf0.1; the pair/recursion families have documented
super-linear terms (pair streams, sequential series).

Usage: python tools/scale_probe.py [sf1_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
SF1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"

OPS = [
    "ext_dedup_ngram_jaccard",
    "ext_dedup_minhash_lsh",
    "ext_span_dedup",
    "ext_similarity_pq",
    "ext_similarity_sq8",
    "bench_skew_window",
    # r8 additions: the one-pass DSIR aggregate (ReusedExchange), the
    # corpus-LM + NTILE bucketing, iterative GD training (T compact
    # passes over a persisted feature frame), and the map-only JL
    # projection (should be the most linear row of the set)
    "ext_dsir_importance",
    "ext_ccnet_buckets",
    "ext_quality_logreg_train",
    "ext_embedding_rp",
]


def main() -> None:
    import __spark_entry__ as entry

    from aws_greengrass_labs_database_influxdb_spark.session import get_spark

    spark = get_spark(app_name="scale_probe")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    qs = entry.queries()

    # warm JVM + Arrow worker pool once (same rationale as bench.py)
    from pyspark.sql import functions as F

    spark.range(32).withColumn("g", F.expr("id % 4")).groupBy("g").applyInPandas(
        lambda p: p, schema="id long, g long"
    ).count()

    out = {}
    for name in OPS:
        res = {}
        for label, sf_dir in (("sf0_1", SF01), ("sf1", SF1)):
            # best of 2: the first run pays shuffle-file/codegen warmup
            # that is session cost, not data-volume cost — the ratio
            # should isolate the volume term (same policy as bench.py)
            best, n = None, 0
            for _ in range(2):
                t0 = time.time()
                n = qs[name](spark, sf_dir).count()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            res[f"{label}_sec"] = round(best, 2)
            res[f"rows_{label}"] = n
        res["ratio"] = round(res["sf1_sec"] / max(res["sf0_1_sec"], 1e-9), 2)
        out[name] = res
        print(f"# {name}: {res}", file=sys.stderr)

    doc = {"k": 10, "sf1_dir": SF1, "ops": out}
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH_SCALE_sf1.json")
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
