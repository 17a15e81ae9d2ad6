"""Shared fixtures.

One session-scoped SparkSession (local mode, small core count so xdist-free
pytest stays fast) and a small deterministic pages corpus, mirroring the
reference's isolation-fixture discipline (/root/reference/tests/conftest.py:9-67).
"""

from __future__ import annotations

import pytest

from iscc_search_spark import corpus as corpus_mod
from iscc_search_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="iscc-search-spark-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("corpus") / "pages.parquet"
    corpus_mod.write_pages(str(p), n_docs=200, seed=42)
    return str(p)


@pytest.fixture(scope="session")
def pages_df(spark, pages_path):
    return spark.read.parquet(pages_path)
