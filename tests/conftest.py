import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark import (
    get_spark,
)

SF_DIR = os.environ.get("SPARKDB_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="sparkdb-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/sparkdb-warehouse"},
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
