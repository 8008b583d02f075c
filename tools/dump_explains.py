"""Dump `.explain("formatted")` for named headline queries to
plans/r<N>/<query>_<tag>.txt — the before/after evidence files the
optimization rounds commit.

Usage: python tools/dump_explains.py <round> <tag> <query> [query ...]
e.g.   python tools/dump_explains.py r16 before ts_ema ts_rsi
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    rnd, tag, *names = sys.argv[1:]
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", rnd
    )
    os.makedirs(outdir, exist_ok=True)

    from aws_greengrass_labs_database_influxdb_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="dump_explains")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    qs = entry_mod.queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"# wrote {path} ({len(txt)} bytes)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
