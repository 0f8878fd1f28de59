import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from sedona_db_spark.session import get_spark
    s = get_spark(app_name="sedona_db_spark-tests", master="local[8]",
                  shuffle_partitions=8)
    yield s


SF_TEST = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_test():
    return SF_TEST


@pytest.fixture(scope="session")
def sf_oracle():
    return SF_ORACLE
