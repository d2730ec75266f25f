from __future__ import annotations

import os

import pytest
from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # adversarial knobs (see tools/check_oracles.py): results must be
    # identical under any partitioning — soak with e.g.
    # SPARK_GRAFT_TEST_SHUFFLE=3 SPARK_GRAFT_TEST_AQE=false
    s = (
        SparkSession.builder.master("local[4]")
        .appName("blaze_spark_tests")
        .config("spark.sql.shuffle.partitions",
                os.environ.get("SPARK_GRAFT_TEST_SHUFFLE", "4"))
        .config("spark.sql.adaptive.enabled",
                os.environ.get("SPARK_GRAFT_TEST_AQE", "true"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def star(spark, sf_dir):
    from blaze_spark import load_star

    return load_star(spark, sf_dir)


@pytest.fixture(scope="session")
def t(spark):
    """The reference's canonical fixture: var * {name: string, amount: int,
    id: int} with rows [['Alice',100,1],['Bob',200,2],['Alice',50,3]]
    (blaze/compute/tests/test_pandas_compute.py:25-31)."""
    from blaze_spark import data

    return data(
        [("Alice", 100, 1), ("Bob", 200, 2), ("Alice", 50, 3)],
        spark=spark,
        schema="name string, amount int, id int",
        name="t",
    )


@pytest.fixture(scope="session")
def cities(spark):
    """Join partner t2: var * {name: string, city: string}
    (blaze/compute/tests/test_spark.py:15-35)."""
    from blaze_spark import data

    return data(
        [("Alice", "Austin"), ("Bob", "Boston")],
        spark=spark,
        schema="name string, city string",
        name="cities",
    )
