from __future__ import annotations

import pytest

from lsh_forest_for_multi_vector_retrieval_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="lshforest-tests",
        master="local[4]",
        shuffle_partitions=4,
        driver_memory="8g",
    )
    yield s
    s.stop()
