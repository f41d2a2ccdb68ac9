from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyetl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # Test-only knobs for the sandbox (gVisor): C1-only JIT makes the JVM
    # start fast; bench.py runs with full JIT + codegen instead.
    spark = get_spark(
        app_name="pyetl_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.driver.extraJavaOptions": "-XX:TieredStopAtLevel=1 -XX:+UseSerialGC",
            "spark.sql.autoBroadcastJoinThreshold": "10m",
        },
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


def rows(df, *cols):
    """Collect to a sorted list of tuples for order-insensitive comparison."""
    data = df.select(*cols).collect() if cols else df.collect()
    return sorted(tuple(r) for r in data)
