import pytest

from fundamental_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    return get_spark(
        "fundamental-spark-tests", master="local[4]", shuffle_partitions=8
    )
