"""Regenerate PLAN_FINGERPRINTS.json — the committed plan-shape
reference for the bench headline queries.

Run after an INTENTIONAL plan change:

    python tools/plan_fingerprint.py            # sf0.1, writes the file
    python tools/plan_fingerprint.py /root/testdata/sf0.1 --check

With --check it exits nonzero on any drift instead of writing (the
same comparison tests/test_plan_fingerprints.py performs in CI).
Queries are PLANNED only, never executed — this takes seconds, and the
side-effecting bench_* maintenance pipelines are excluded (their
construction writes; their shape is pinned by tests/test_rollup.py and
tests/test_streaming.py instead).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "PLAN_FINGERPRINTS.json")


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--check"]
    check = "--check" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"

    import bench as bench_mod
    from aws_greengrass_labs_database_influxdb_spark.plans.fingerprint import fingerprint_queries
    from aws_greengrass_labs_database_influxdb_spark.session import get_spark

    spark = get_spark(app_name="plan_fingerprint")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    fps = fingerprint_queries(spark, sf_dir, bench_mod.HEADLINE)
    doc = {"sf_dir": sf_dir, "queries": fps}

    if check:
        with open(OUT) as f:
            committed = json.load(f)
        drift = {
            n: {"committed": committed["queries"].get(n, {}).get("fp"),
                "current": fp["fp"]}
            for n, fp in fps.items()
            if committed["queries"].get(n, {}).get("fp") != fp["fp"]
        }
        if drift:
            print(json.dumps(drift, indent=2))
            print(f"DRIFT in {len(drift)} plans — intentional? rerun without --check")
            return 1
        print(f"OK: {len(fps)} plans match {OUT}")
        return 0

    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(fps)} fingerprints to {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
