from __future__ import annotations

import pytest

from addressparser_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="tests", cores=4, shuffle_partitions=8, driver_memory="4g")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
