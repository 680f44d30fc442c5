import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ahrd_spark.session import get_spark  # noqa: E402

REFERENCE_RESOURCES = "/root/reference/test/resources"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="ahrd_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield s


@pytest.fixture(scope="session")
def ref_resources():
    if not os.path.isdir(REFERENCE_RESOURCES):
        pytest.skip("reference fixture directory not available")
    return REFERENCE_RESOURCES
