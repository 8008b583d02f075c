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
       "ext_dedup_ngram_jaccard", "bench_mixed_union_selectors"]


def _events_max_ns_any(path: str) -> int:
    """Max event ts (epoch ns) from parquet FOOTER stats — handles
    both a single file (testdata) and a Spark-written directory (the
    generated probe corpora). Zero Spark jobs."""
    import glob as _glob
    import os as _os

    import pandas as pd
    import pyarrow.parquet as pq

    files = ([path] if _os.path.isfile(path)
             else sorted(_glob.glob(f"{path}/*.parquet")))
    mx = None
    for f in files:
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).path for i in range(md.num_columns)]
        ti = names.index("ts")
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(ti).statistics
            if st is not None and st.max is not None:
                v = st.max if isinstance(st.max, int) else pd.Timestamp(st.max).value
                mx = v if mx is None or v > mx else mx
    return mx


def _mixed_probe(spark, sf_dir):
    """Probe variant of bench_mixed_union_selectors (r14, VERDICT r13
    #7): the suite row pins its range to Jan 2024 for the oracle, but
    the probe corpus grows by TIME-SHIFTED copies — so the probe
    ranges to each dataset's max event time (parquet footer stats,
    zero pre-scan jobs). Windows then scale linearly with the
    retention span: the honest scale shape for a dashboard over a
    growing window, exercising union + variable-bound range + catalog
    regroup + slot-carrying aggregateWindow + typed min/max."""
    import datetime as dt

    from pyspark.sql import functions as F

    from aws_greengrass_labs_database_influxdb_spark.frontends.flux import execute_flux, seed_live_slots
    from aws_greengrass_labs_database_influxdb_spark.suite.frontend import _events_mixed_points

    stop_ns = _events_max_ns_any(f"{sf_dir}/events.parquet") + 3600 * 10**9
    stop = dt.datetime.fromtimestamp(
        stop_ns // 10**9, dt.timezone.utc
    ).strftime("%Y-%m-%dT%H:%M:%SZ")
    pts = _events_mixed_points(spark, sf_dir)
    seed_live_slots(pts, {"float", "string", "bool"}, exact=True,
                    catalog={"events": {"value": "float",
                                        "status": "string",
                                        "flag": "bool"}})
    pre = (
        'a = from(bucket:"b") |> filter(fn: (r) => r._field == "status")\n'
        'b = from(bucket:"b") |> filter(fn: (r) => r._field == "value")\n'
        "base = union(tables: [a, b]) "
        f"|> range(start: 2024-01-01T00:00:00Z, stop: {stop}) "
        '|> group(columns: ["event_type", "_field"]) '
        "|> aggregateWindow(every: 1h, fn: last, createEmpty: true)\n"
    )
    sel = lambda df, op: df.select(  # noqa: E731
        F.lit(op).alias("op"), F.col("event_type"), F.col("field"),
        F.col("f_str").alias("sval"), F.col("f_float").alias("fval"),
    )
    mn = execute_flux(pts, pre + "base |> min()")
    mx = execute_flux(pts, pre + "base |> max()")
    return sel(mn, "min").unionByName(sel(mx, "max"))


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

    qs["bench_mixed_union_selectors"] = _mixed_probe  # probe variant

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
