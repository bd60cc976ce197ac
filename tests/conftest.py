import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from openue_spark.session import get_spark

    s = get_spark(app_name="openue_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-linking-run integration tests (30-240s each; the fold/"
        "resume/replay equality proofs). `pytest -m 'not slow'` is the fast "
        "iteration gate (~5 min); run the full suite before committing "
        "pipeline-semantics changes.",
    )
