from __future__ import annotations

import pytest

from surya_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="surya_spark_tests", cores=8, shuffle_partitions=8,
                  driver_memory="8g")
    yield s
    s.stop()
