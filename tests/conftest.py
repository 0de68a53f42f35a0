from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE = "/root/reference"
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


def reference_fixture(relpath: str) -> str:
    """Absolute path of a reference test fixture; skip if unavailable
    (keeps the suite green outside this sandbox)."""
    p = os.path.join(REFERENCE, relpath)
    if not os.path.exists(p):
        pytest.skip(f"reference fixture not available: {relpath}")
    return p


@pytest.fixture(scope="session")
def spark():
    from gleaner_spark.plans.session import build_session

    spark = build_session(app_name="gleaner-spark-tests", cores=4,
                          shuffle_partitions=8)
    yield spark
    spark.stop()
