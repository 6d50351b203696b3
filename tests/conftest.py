import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_pipeline_for_detection_banking_fraud_spark.session import get_spark  # noqa: E402

REFERENCE_DATA = "/root/reference/data/data"
DDL_DML = os.path.join(os.path.dirname(REFERENCE_DATA), "ddl_dml.sql")
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


@pytest.fixture(scope="session")
def ddl_dml():
    return DDL_DML


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    os.environ.setdefault("TZ", "UTC")
    s = get_spark(
        app_name="fraud_etl_tests",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.warehouse.dir": str(tmp_path_factory.mktemp("spark_warehouse"))
        },
    )
    yield s


@pytest.fixture(scope="session")
def ref_data():
    return REFERENCE_DATA


@pytest.fixture(scope="session")
def sf001():
    return os.path.join(TESTDATA, "sf0.001")


@pytest.fixture(scope="session")
def sf01():
    return os.path.join(TESTDATA, "sf0.01")
