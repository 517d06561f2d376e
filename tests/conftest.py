import os
import shutil
import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("orama-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.default.parallelism", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .getOrCreate()
    )
    yield spark
    spark.stop()


@pytest.fixture()
def tmpdir_index():
    d = tempfile.mkdtemp(prefix="orama_spark_idx_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
