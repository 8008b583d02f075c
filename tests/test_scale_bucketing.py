"""Scale evidence: bucketed co-located joins run with ZERO Exchange.

The repeated large-×-large join (events ⋈ customers here) is the
canonical 100 TB shuffle bottleneck; bucketing both sides by the join
key at write time removes the Exchange entirely — each task merges its
bucket file pair locally. This test asserts the *physical plan*, not
just the result.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_greengrass_labs_database_influxdb_spark.sources.bucketed import bucketed_table, save_bucketed


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    n = 5000
    users = spark.range(n).select(
        F.col("id").alias("user_id"), (F.col("id") % 7).alias("segment")
    )
    events = spark.range(n * 4).select(
        (F.col("id") % n).alias("user_id"), (F.col("id") * 1.5).alias("value")
    )
    try:
        save_bucketed(users, "bt_users", ["user_id"], 8, path=str(tmp_path / "u"))
        save_bucketed(events, "bt_events", ["user_id"], 8, path=str(tmp_path / "e"))
        # disable broadcast so the join would otherwise shuffle both sides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = bucketed_table(spark, "bt_events").join(
            bucketed_table(spark, "bt_users"), "user_id"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert j.count() == n * 4
        # sanity: the same join over plain parquet DOES shuffle
        plain = events.join(users, "user_id")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bt_users")
        spark.sql("DROP TABLE IF EXISTS bt_events")
