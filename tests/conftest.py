import pytest

from icdar_2019_rrc_sroie_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    session = get_spark("tests", master="local[8]")
    session.sparkContext.setLogLevel("ERROR")
    yield session
