import pytest


@pytest.fixture(scope="session")
def spark():
    "One small local SparkSession shared by all Spark-marked tests."
    from courlan_spark.plans.session import get_session

    session = get_session(app_name="courlan-spark-tests", cpus=4, shuffle_partitions=8)
    session.sparkContext.setLogLevel("ERROR")
    yield session
    session.stop()
