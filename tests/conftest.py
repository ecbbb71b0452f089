from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from data_pipeline_challenge_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def spark_prop(spark):
    """Alias fixture for Hypothesis tests (function-scoped @given cannot
    take a session fixture named the same as a parametrized arg)."""
    return spark


@pytest.fixture()
def warehouse(tmp_path):
    return tmp_path / "warehouse"


@pytest.fixture()
def landing(tmp_path):
    d = tmp_path / "landing"
    d.mkdir()
    return d
