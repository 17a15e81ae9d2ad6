"""SearchIndex facade: metadata enrichment (J4), more-like-this (J5/P5),
near-duplicates from the sidecar, stats (S8/A10)."""

import pytest
from pyspark.sql import functions as F

from iscc_search_spark.config import EngineConfig
from iscc_search_spark.operators.build import build_index
from iscc_search_spark.plans.search import SearchIndex


@pytest.fixture(scope="module")
def index(spark, pages_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("facade_idx"))
    build_index(spark, pages_df, d, cfg=EngineConfig(block_size=32), n_parts=4, n_shards=4, group_size=4)
    return SearchIndex(spark, d)


def test_search_with_metadata(index):
    rows = index.search("t00001 t00002", k=5).collect()
    assert 0 < len(rows) <= 5
    for r in rows:
        assert r["url"].startswith("https://")
        assert r["doc_len"] > 0
        assert r["lang"] in ("en", "de", "fr")


def test_more_like_this_excludes_self(index, spark):
    doc = spark.read.parquet(index.cat.docs).select("doc_id").first()["doc_id"]
    rows = index.more_like_this(doc, k=5).collect()
    assert rows
    assert all(r["doc_id"] != doc for r in rows)
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    with pytest.raises(KeyError):
        index.more_like_this(999999999999, k=5)


def test_near_duplicates_found(index):
    pairs = index.near_duplicates(max_hamming=6).collect()
    assert pairs  # corpus seeds 5% near-dups
    for p in pairs:
        assert p["score"] >= 1.0 - 6.0 / 64.0


def test_stats(index):
    st = index.stats()
    assert st["n_docs"] == 200
    assert st["n_terms"] > 0
    assert st["n_posting_blocks"] > 0


def test_stats_default_runs_zero_spark_jobs(index):
    """The default stats() path must not touch Spark at all (meta +
    parquet footers only) and must agree with the exact=True Spark-job
    recount on every count field."""
    cheap = index.stats()
    full = index.stats(exact=True)
    for k in ("n_docs", "n_posting_blocks", "n_terms"):
        assert cheap[k] == full[k], k
    for k in ("n_units", "n_simprints"):
        if k in full:
            assert cheap[k] == full[k], k

    class _NoSpark:  # any attribute access = a Spark touch = failure
        def __getattr__(self, name):
            raise AssertionError(f"default stats() touched spark.{name}")

    saved = index.spark
    index.spark = _NoSpark()
    try:
        again = index.stats()
        assert again == cheap
    finally:
        index.spark = saved
