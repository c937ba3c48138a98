"""Shared pytest fixtures: one SparkSession per test session, deterministic
transcript fixtures written once to tests/data/ (gitignored)."""

from __future__ import annotations

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from features_engineering_of_motion_data_spark.fixtures import (  # noqa: E402
    ensure_transcripts_parquet,
    generate_transcripts,
)
from features_engineering_of_motion_data_spark.session import get_spark  # noqa: E402

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", app_name="pytest", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def tiny_path() -> str:
    return ensure_transcripts_parquet("tiny")


@pytest.fixture(scope="session")
def small_path() -> str:
    return ensure_transcripts_parquet("small")


@pytest.fixture(scope="session")
def tiny_pdf(tiny_path) -> pd.DataFrame:
    return pd.read_parquet(tiny_path)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    # override with SPARK_GRAFT_TEST_SF=sf0.01 to run the driver-mimic
    # contract at the driver's own scale
    return os.path.join(TESTDATA, os.environ.get("SPARK_GRAFT_TEST_SF", "sf0.001"))
