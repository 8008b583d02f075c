"""Generate a K× upsampled corpus for the scale probe (default 10× of
sf0.1 → "sf1") under /tmp/spark_graft_sf1.

Never touches /root/testdata. The upsampling preserves each table's
*internal* statistical structure so measured scaling isolates data
volume, not distribution drift:

- documents: copy c prefixes every token with ``c{c}·`` — a vocabulary
  "translation". Copies share no shingles, so the corpus is K
  independent shards of the original: near-dup pair counts, shingle
  frequencies, and cluster sizes all scale exactly linearly (the right
  null hypothesis for a linearity probe; cross-copy near-dups would
  inflate pairs superlinearly and contaminate the measurement).
- embeddings: copy c adds deterministic small noise (±0.02, seeded by
  vec_id·c) — cluster structure preserved, corpus K×.
- events: copy c shifts time by c·(span+1h) — same series keys, so
  series COUNT stays constant and series LENGTH grows K×: the honest
  worst case for the sequential-recurrence (EMA) family and the
  salted-window aggregation.

Usage: python tools/gen_scale_probe.py [K] [src_sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
OUT = sys.argv[3] if len(sys.argv) > 3 else "/tmp/spark_graft_sf1"


def main() -> None:
    from pyspark.sql import functions as F

    from aws_greengrass_labs_database_influxdb_spark.session import get_spark

    spark = get_spark(app_name="gen_scale_probe")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    os.makedirs(OUT, exist_ok=True)

    # ---- documents: K token-translated shards, ids offset per copy
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    id_stride = 10_000_000
    copies = []
    for c in range(K):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(c * id_stride))
        if c > 0:
            d = d.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), r"\s+"),
                        lambda t: F.concat(F.lit(f"c{c}·"), t),
                    ),
                    " ",
                ),
            )
        copies.append(d)
    out = copies[0]
    for d in copies[1:]:
        out = out.unionByName(d)
    out.repartition(32).write.mode("overwrite").parquet(f"{OUT}/documents.parquet")

    # ---- embeddings: K noise-perturbed copies
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    copies = []
    for c in range(K):
        e = emb.withColumn("vec_id", F.col("vec_id") + F.lit(c * id_stride))
        if c > 0:
            # deterministic ±0.02 jitter: xxhash of (vec_id, dim, copy)
            e = e.withColumn(
                "embedding",
                F.transform(
                    F.col("embedding"),
                    lambda v, i: (
                        v
                        + (
                            F.pmod(
                                F.xxhash64(F.col("vec_id"), i, F.lit(c)), F.lit(1000)
                            ).cast("float")
                            / F.lit(25000.0)
                            - F.lit(0.02)
                        )
                    ).cast("float"),
                ),
            )
        copies.append(e)
    out = copies[0]
    for e in copies[1:]:
        out = out.unionByName(e)
    out.repartition(16).write.mode("overwrite").parquet(f"{OUT}/embeddings.parquet")

    # ---- events: K time-shifted copies (series length ×K)
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    ts_type = dict(ev.dtypes)["ts"]
    ns_mode = ts_type in ("bigint", "long")
    if ns_mode:
        bounds = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
        span_ns = int(bounds[1]) - int(bounds[0]) + 3600 * 10**9
    else:
        bounds = ev.agg(
            F.min(F.unix_micros(F.col("ts").cast("timestamp"))),
            F.max(F.unix_micros(F.col("ts").cast("timestamp"))),
        ).collect()[0]
        span_s = (int(bounds[1]) - int(bounds[0])) // 1_000_000 + 3600
    copies = []
    for c in range(K):
        e = ev.withColumn("event_id", F.col("event_id") + F.lit(c * id_stride))
        if c > 0:
            if ns_mode:
                e = e.withColumn("ts", F.col("ts") + F.lit(c * span_ns))
            else:
                e = e.withColumn(
                    "ts",
                    (F.col("ts").cast("timestamp")
                     + F.make_dt_interval(secs=F.lit(float(c * span_s)))
                     ).cast(ts_type),
                )
        copies.append(e)
    out = copies[0]
    for e in copies[1:]:
        out = out.unionByName(e)
    out.repartition(32).write.mode("overwrite").parquet(f"{OUT}/events.parquet")

    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem"):
        src = f"{SRC}/{t}.parquet"
        if os.path.exists(src):
            spark.read.parquet(src).write.mode("overwrite").parquet(
                f"{OUT}/{t}.parquet"
            )

    for t in ("documents", "embeddings", "events"):
        n = spark.read.parquet(f"{OUT}/{t}.parquet").count()
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
