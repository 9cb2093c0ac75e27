from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

FIXTURES = Path(__file__).resolve().parent / "fixtures"
REFERENCE_FIXTURES = Path("/root/reference/src/test/resources")
SF_SMALL = Path(os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001"))


@pytest.fixture(scope="session")
def spark():
    from xml_hive_spark.session import get_spark

    s = get_spark(app_name="xml-hive-spark-tests", cpus=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def fixtures_dir() -> Path:
    return FIXTURES


@pytest.fixture(scope="session")
def sf_dir() -> str:
    if not SF_SMALL.exists():
        pytest.skip("driver testdata not present")
    return str(SF_SMALL)
