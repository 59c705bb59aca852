import pytest


@pytest.fixture(scope="session")
def spark():
    from doctr_spark.session import get_spark

    s = get_spark(cores=4, app_name="doctr-spark-tests", shuffle_partitions=4)
    yield s
    s.stop()
