from __future__ import annotations

import pytest

from lakeview_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("lakeview-tests", master="local[4]", shuffle_partitions=4)
    yield spark
