import pytest

from timberjack_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    return get_spark(cores=4, shuffle_partitions=8, app_name="timberjack_tests")
