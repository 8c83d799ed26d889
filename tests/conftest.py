from __future__ import annotations

import shutil
import tempfile

import pytest

from dudb_spark.session import get_spark
from dudb_spark.sources.fixtures import SyntheticTree


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dudb_spark-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def fs_dir(spark):
    """A small synthetic tree written to Parquet once per test session."""
    d = tempfile.mkdtemp(prefix="dudb_fs_")
    tree = SyntheticTree(depth=2, breadth=2, nfiles=3)
    tree.write(spark, d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def tree():
    """The same tree as raw rows, for golden/oracle computation."""
    return SyntheticTree(depth=2, breadth=2, nfiles=3).build()
