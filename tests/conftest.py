from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from azure_databricks_lakehouse_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    warehouse = str(tmp_path_factory.mktemp("spark-warehouse"))
    s = get_spark(
        "tests",
        master="local[4]",
        shuffle_partitions="4",
        extra_conf={
            "spark.sql.warehouse.dir": warehouse,
            # Interpreted expression/operator mode for the TEST session
            # only (round 13): the suite runs thousands of unique tiny
            # plans, so Janino whole-stage/expression compilation
            # dominates per-query latency (A-B-A on test_dvs.py:
            # 153s/121s with codegen vs 87s without — ~1.5-1.75x).
            # Production/bench sessions keep codegen on; the oracle
            # gate runs the 50 declared queries under a bare codegen-on
            # session, so a codegen-specific regression still surfaces
            # there.
            "spark.sql.codegen.wholeStage": "false",
            "spark.sql.codegen.factoryMode": "NO_CODEGEN",
        },
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
