from __future__ import annotations

import sys
import os

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from parquet_pipeline_spark.session import get_spark

    spark = get_spark("tests", shuffle_partitions=8, extra_conf={"spark.master": "local[8]"})
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
