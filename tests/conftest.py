from __future__ import annotations

import shutil
import tempfile

import pytest

from docix_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("docix-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tmp_root():
    d = tempfile.mkdtemp(prefix="docix_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
