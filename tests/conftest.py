from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # lean local sessions for tests

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from aws_greengrass_labs_database_influxdb_spark.session import get_spark

    # NOTE: no extra conf here — pytest must exercise the exact session
    # config the external driver uses (ADVICE r3: a conftest-only
    # nanosAsLong override masked the r3 loader crash).
    s = get_spark(app_name="tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


@pytest.fixture(scope="session")
def points(spark, sf_dir):
    from aws_greengrass_labs_database_influxdb_spark.sources.io import events_points

    return events_points(spark, sf_dir).cache()
