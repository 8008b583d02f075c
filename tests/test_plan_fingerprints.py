"""CI gate: physical-plan shapes of the bench headline queries must
match the committed PLAN_FINGERPRINTS.json (VERDICT r5 item 1 — makes
"timing moved" adjudicable as plan-change vs environment).

On an INTENTIONAL plan change, regenerate with

    python tools/plan_fingerprint.py

and commit the updated file; this test then documents the change as a
reviewed diff instead of a silent drift.
"""

from __future__ import annotations

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FP_FILE = os.path.join(REPO, "PLAN_FINGERPRINTS.json")


@pytest.mark.skipif(
    not os.path.isdir("/root/testdata/sf0.1"),
    reason="fingerprints are pinned at the bench scale factor (sf0.1)",
)
def test_headline_plan_shapes_match_committed(spark):
    import sys

    sys.path.insert(0, REPO)
    import bench as bench_mod
    from aws_greengrass_labs_database_influxdb_spark.plans.fingerprint import fingerprint_queries

    with open(FP_FILE) as f:
        committed = json.load(f)

    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        current = fingerprint_queries(
            spark, committed["sf_dir"], bench_mod.HEADLINE
        )
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)

    drift = {
        name: {
            "committed": committed["queries"].get(name),
            "current": fp,
        }
        for name, fp in current.items()
        if committed["queries"].get(name, {}).get("fp") != fp["fp"]
    }
    assert not drift, (
        "plan shape drifted for "
        + ", ".join(sorted(drift))
        + " — if intentional run `python tools/plan_fingerprint.py` and "
        + "commit; detail: "
        + json.dumps(drift, indent=1)[:2000]
    )
    # the committed file must cover the full headline set (no silently
    # dropped rows when HEADLINE grows)
    assert set(committed["queries"]) == set(bench_mod.HEADLINE)
