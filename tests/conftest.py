import pytest


@pytest.fixture(scope="session")
def spark():
    from slowspark.session import get_spark

    s = get_spark("slowspark-tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
