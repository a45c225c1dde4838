from __future__ import annotations

import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def spark():
    from pdf_to_epub_spark.session import get_spark

    s = get_spark(app_name="pdf_to_epub_spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
