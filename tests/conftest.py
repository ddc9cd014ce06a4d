import os

import pytest

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMALL = os.path.join(TESTDATA, "sf0.001")
SF_MED = os.path.join(TESTDATA, "sf0.01")


@pytest.fixture(scope="session")
def spark():
    from tdigest_spark.spark.session import get_spark

    cores = int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8"))
    s = get_spark("tdigest-spark-tests", cores=cores, shuffle_partitions=8)
    yield s
