from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from datafusion_test_spark.session import get_session

    s = get_session("pytest")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMALL
