from __future__ import annotations

import pytest

from web_scraping_etl_pipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="wsep-tests", master="local[4]", shuffle_partitions=4)
    yield spark
    spark.stop()


SF_DIR = "/root/testdata/sf0.001"
SF_DIR_T2 = "/root/testdata/sf0.01"
