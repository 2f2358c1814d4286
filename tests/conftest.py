import pytest


@pytest.fixture(scope="session")
def spark():
    from cuphic_spark.session import get_spark

    s = get_spark(cores=8)
    yield s
