from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from markmuse_spark.session import get_spark

    s = get_spark(master="local[4]", app_name="markmuse-tests", shuffle_partitions=8)
    yield s
    s.stop()
