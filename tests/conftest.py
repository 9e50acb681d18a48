from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from tersets_spark.session import get_spark

    spark = get_spark(master="local[4]", app_name="tersets_spark-tests",
                      shuffle_partitions=8)
    yield spark
    spark.stop()
