from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_DRIVER_MEM", "8g")


@pytest.fixture(scope="session")
def spark():
    from pagerank_spark.session import get_spark

    s = get_spark(
        "pagerank_spark_tests", cpus=4, shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/pagerank-spark-warehouse"})
    yield s
    s.stop()
