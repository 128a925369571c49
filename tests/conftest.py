import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from debezium_connector_spanner_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="cdc-tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield s


@pytest.fixture()
def tmp_root(tmp_path):
    return str(tmp_path)
