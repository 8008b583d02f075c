"""Audit: find duplicated (canonically-equal) shuffle exchanges that
Spark did NOT reuse in the executed plans of the headline queries.

Each such pair means a corpus-sized subtree (scan/explode/partial agg)
executes twice — at 100 TB that is the difference between one pass and
two. The usual cause is `InferFiltersFromConstraints` pushing an
inferred isnotnull below an aggregate on one join branch only, which
de-canonicalizes otherwise-identical subtrees (see
ext/text.py dsir_importance for the fix pattern: add the vacuous
filter explicitly so both branches match and ReuseExchange fires).

Usage: python tools/audit_reuse.py [sf_dir]  (default sf0.001; plans
are shape-identical across sf). Prints one line per query:
    <name> exchanges=<n> reused=<r> dup_unreused=<d>
and details for every dup_unreused group.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def walk(node, shuffles, reused):
    name = node.getClass().getSimpleName()
    if "ShuffleExchange" in name:
        shuffles.append(node)
    if "ReusedExchange" in name:
        reused.append(node)
    # AQE wrappers hide their executed subtree from children():
    # AdaptiveSparkPlanExec holds it in executedPlan, QueryStageExec
    # (Shuffle/Broadcast/Result) in plan — descend into those too.
    if name == "AdaptiveSparkPlanExec":
        walk(node.executedPlan(), shuffles, reused)
    elif "QueryStage" in name:
        walk(node.plan(), shuffles, reused)
    for i in range(node.children().size()):
        walk(node.children().apply(i), shuffles, reused)
    return shuffles, reused


def main() -> None:
    from aws_greengrass_labs_database_influxdb_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark(app_name="audit_reuse")
    qs = entry_mod.queries()
    flagged = {}
    for name, fn in qs.items():
        if name.startswith("bench_"):  # side-effecting maintenance rows
            continue
        try:
            df = fn(spark, SF_DIR)
            # collect() (NOT count(): count builds a separate plan and
            # this df's own queryExecution would stay unexecuted /
            # pre-AQE) so the final adaptive plan with reuse is real
            df.collect()
            plan = df._jdf.queryExecution().executedPlan()
        except Exception as exc:  # noqa: BLE001 — audit must not stop
            print(f"{name}: ERR {exc}", file=sys.stderr)
            continue
        shuffles, reused = walk(plan, [], [])
        groups: dict[str, int] = {}
        for x in shuffles:
            key = x.canonicalized().toString()
            groups[key] = groups.get(key, 0) + 1
        dups = {k: c for k, c in groups.items() if c > 1}
        line = (
            f"{name} exchanges={len(shuffles)} reused={len(reused)} "
            f"dup_unreused={sum(c - 1 for c in dups.values())}"
        )
        print(line)
        if dups:
            flagged[name] = dups
            for k, c in dups.items():
                head = k.split("\n", 1)[0][:120]
                print(f"  x{c}: {head}")
    print(f"\nflagged: {sorted(flagged)}")


if __name__ == "__main__":
    main()
