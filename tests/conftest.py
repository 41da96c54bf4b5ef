import pytest

from lindel_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("lindel-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
