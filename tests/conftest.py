import pytest

from document_text_extraction_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dte-tests", master="local[8]", shuffle_partitions=8,
                  extra_conf={"spark.driver.memory": "8g"})
    yield s
    s.stop()
