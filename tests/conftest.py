"""Shared Spark fixture for the unit suite.

One session per pytest run (JVM startup is ~10 s; per-test sessions would
dominate runtime). Small shuffle-partition count: these are hand-sized
frames, not scale tests — scale behavior is exercised by bench.py at sf0.1.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from hierarchical_graph_db_spark.session import get_spark

    s = get_spark("unit-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL
