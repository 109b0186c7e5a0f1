from __future__ import annotations

import datetime as dt
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stream_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    s = get_spark("tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"


@pytest.fixture()
def tiny_events(spark):
    """12 deterministic events: 2 users, values 1..12, 10s apart."""
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (i, base + dt.timedelta(seconds=10 * i), 100 + (i % 2), "click" if i % 2 else "view", float(i + 1))
        for i in range(12)
    ]
    return spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string, value double")
