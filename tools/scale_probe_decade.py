"""Second-decade scale probe (VERDICT r8 item 6): the two sf1 rows
whose 10× ratio was super-unit for *explained* reasons — ccnet (2.47×,
per-language NTILE sort) and logreg (2.26×, fixed per-pass cost) — plus
ngram_jaccard as a known-linear control, re-measured at 30×
(tools/gen_scale_probe.py 30 → "sf3"). If the explanations are right,
the sf3/sf1 ratio must bend TOWARD linear (≤ 3× for the 3× data step,
since the fixed-cost share shrinks); a ratio pulling away from 3×
would instead indicate a hidden super-linear term.

Writes BENCH_SCALE_sf3.json:
  {"ops": {name: {"sf1_sec", "sf3_sec", "step_ratio", "rows_sf1",
                  "rows_sf3"}}, "k_sf1": 10, "k_sf3": 30}

Usage: python tools/scale_probe_decade.py [sf1_dir] [sf3_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
SF3 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark_graft_sf3"

OPS = ["ext_ccnet_buckets", "ext_quality_logreg_train",
       "ext_dedup_ngram_jaccard"]


def main() -> None:
    import __spark_entry__ as entry

    from aws_greengrass_labs_database_influxdb_spark.session import get_spark

    spark = get_spark(app_name="scale_probe_decade")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    qs = entry.queries()

    from pyspark.sql import functions as F

    spark.range(32).withColumn("g", F.expr("id % 4")).groupBy("g").applyInPandas(
        lambda p: p, schema="id long, g long"
    ).count()

    out = {}
    for name in OPS:
        res = {}
        for label, sf_dir in (("sf1", SF1), ("sf3", SF3)):
            best, n = None, 0
            for _ in range(3):  # best-of-3: the shared-session GC/page
                # -cache variance at these sizes exceeds best-of-2's
                # absorption (observed: a 29s outlier vs an 8s steady
                # state on the same op+data)
                t0 = time.time()
                n = qs[name](spark, sf_dir).count()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            res[f"{label}_sec"] = round(best, 2)
            res[f"rows_{label}"] = n
        res["step_ratio"] = round(res["sf3_sec"] / max(res["sf1_sec"], 1e-9), 2)
        out[name] = res
        print(f"# {name}: {res}", file=sys.stderr)

    doc = {"k_sf1": 10, "k_sf3": 30, "sf3_dir": SF3, "ops": out}
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH_SCALE_sf3.json")
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(json.dumps(doc))


if __name__ == "__main__":
    main()
