"""Auxiliary-source suite rows (VERDICT r4 item 7): csv.from and
array.from exercised end-to-end with DuckDB oracles. sql.from stays
untested by declared design — the container has no JDBC target; its
wrapper is documented in sources/aux_sources.py.
"""

from __future__ import annotations

import csv
import os

from pyspark.sql import functions as F

from ..sources.io import load_table
from . import q

_AUX_ROOT = "/tmp/spark_graft_aux"


@q(
    "aux_csv_from",
    """
    SELECT r_regionkey, upper(r_name) AS region_upper
    FROM region ORDER BY r_regionkey
    """,
)
def aux_csv_from(spark, sf_dir):
    """csv.from: materialize the region table as a CSV (driver-side,
    5 rows), read it back through the csv.from wrapper with an explicit
    schema (no inference double-scan), and project. The oracle reads
    the same rows from the parquet view — proving the CSV round-trip
    is lossless."""
    from ..sources.aux_sources import csv_from

    os.makedirs(_AUX_ROOT, exist_ok=True)
    path = f"{_AUX_ROOT}/region.csv"
    rows = sorted(
        load_table(spark, sf_dir, "region").collect(), key=lambda r: r.r_regionkey
    )
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["r_regionkey", "r_name"])
        for r in rows:
            w.writerow([r.r_regionkey, r.r_name])
    df = csv_from(spark, path, schema="r_regionkey long, r_name string")
    return df.select(
        "r_regionkey", F.upper("r_name").alias("region_upper")
    ).orderBy("r_regionkey")


@q(
    "aux_array_from",
    """
    SELECT r.r_name, t.tier
    FROM region r
    JOIN (VALUES (0, 'emerging'), (1, 'core'), (2, 'core'),
                 (3, 'core'), (4, 'emerging')) AS t(r_regionkey, tier)
      ON r.r_regionkey = t.r_regionkey
    ORDER BY r.r_name
    """,
)
def aux_array_from(spark, sf_dir):
    """array.from: literal rows as a DataFrame, used the way Flux uses
    it — a small inline dimension broadcast-joined against a real
    table. The oracle is the equivalent ANSI VALUES list."""
    from ..sources.aux_sources import array_from

    dim = array_from(
        spark,
        [
            {"r_regionkey": 0, "tier": "emerging"},
            {"r_regionkey": 1, "tier": "core"},
            {"r_regionkey": 2, "tier": "core"},
            {"r_regionkey": 3, "tier": "core"},
            {"r_regionkey": 4, "tier": "emerging"},
        ],
        schema="r_regionkey long, tier string",
    )
    region = load_table(spark, sf_dir, "region")
    return (
        region.join(F.broadcast(dim), "r_regionkey")
        .select("r_name", "tier")
        .orderBy("r_name")
    )
