"""Round-5 robustness fixes.

- on-disk format versioning: readers/updaters refuse a version-mismatched
  index instead of silently misreading pre-sh_lo part files;
- manager first-build failure keeps the empty index registered (temp-dir
  build + swap);
- RemoteIndex rejects max_retries < 1 up front;
- dup_clusters converges on chains longer than max_iter via pointer
  doubling, and raises (never returns split labels) when genuinely out of
  rounds;
- the 128-bit term-hash cache never grows past its cap.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from iscc_search_spark.catalog import FORMAT_VERSION, IndexCatalog
from iscc_search_spark.config import EngineConfig
from iscc_search_spark.functions import simhash as sh
from iscc_search_spark.manager import IndexManager
from iscc_search_spark.operators.build import build_index, load_simprints, upsert_docs
from iscc_search_spark.operators.dedup import dup_clusters
from iscc_search_spark.operators.wand import IndexReader
from iscc_search_spark.remote import RemoteIndex


@pytest.fixture(scope="module")
def small_index(spark, pages_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("fmtindex"))
    build_index(
        spark, pages_df.limit(40), d, cfg=EngineConfig(),
        n_parts=2, n_shards=2, group_size=2,
    )
    return d


def _set_version(index_dir: str, v) -> dict:
    cat = IndexCatalog(index_dir)
    meta = cat.read_meta()
    old = dict(meta)
    if v is None:
        meta.pop("format_version", None)  # pre-versioning index reads as v1
    else:
        meta["format_version"] = v
    cat.write_meta(meta)
    return old


def test_meta_carries_format_version(small_index):
    meta = IndexCatalog(small_index).read_meta()
    assert meta["format_version"] == FORMAT_VERSION


@pytest.mark.parametrize("bad", [None, 1, 99])
def test_version_mismatch_refused(spark, small_index, pages_df, bad):
    old = _set_version(small_index, bad)
    try:
        with pytest.raises(RuntimeError, match="format_version"):
            IndexReader(spark, small_index)
        with pytest.raises(RuntimeError, match="format_version"):
            load_simprints(spark, small_index)
        with pytest.raises(RuntimeError, match="format_version"):
            upsert_docs(spark, pages_df.limit(3), small_index)
    finally:
        IndexCatalog(small_index).write_meta(old)
    # restored: opens fine again
    assert IndexReader(spark, small_index).n_docs == 40


def test_manager_failed_first_build_keeps_registration(spark, pages_df, tmp_path):
    mgr = IndexManager(spark, str(tmp_path / "root"), n_parts=2, n_shards=2)
    mgr.create_index("fragile")
    # a frame without the pages columns fails the build up front
    bad = spark.range(5).toDF("id")
    with pytest.raises(Exception):
        mgr.add_assets("fragile", bad)
    # the durable registration survives the failed build...
    assert [i["name"] for i in mgr.list_indexes()] == ["fragile"]
    assert mgr.get_index("fragile")["assets"] == 0
    # ...no temp build dir leaks...
    assert not os.path.exists(os.path.join(mgr.base_path, "fragile.build"))
    # ...and a subsequent good batch promotes it normally
    info = mgr.add_assets("fragile", pages_df.limit(30))
    assert info["assets"] == 30
    assert mgr.open("fragile").stats()["n_docs"] == 30


def test_remote_rejects_zero_retries():
    with pytest.raises(ValueError, match="max_retries"):
        RemoteIndex("http://127.0.0.1:1", max_retries=0)
    with pytest.raises(ValueError, match="max_retries"):
        RemoteIndex("http://127.0.0.1:1", max_retries=-2)


def test_dup_clusters_long_chain_converges(spark):
    # chain 0-1-2-...-59: diameter 59 > the 25-round default — pure
    # min-label propagation would stop split; pointer doubling converges
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(59)], "doc1 long, doc2 long"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dup_clusters(pairs).collect()}
    assert len(got) == 60
    assert set(got.values()) == {0}


def test_dup_clusters_raises_when_out_of_rounds(spark):
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "doc1 long, doc2 long"
    )
    with pytest.raises(RuntimeError, match="converge"):
        dup_clusters(pairs, max_iter=1)


def test_combo2_false_tier(spark, pages_df, tmp_path):
    """combo2=False builds every artifact except the high-threshold band
    table; the facade falls back to the single-band lookup at h >= 10;
    incremental maintenance never resurrects the skipped tier."""
    import os

    from iscc_search_spark.operators.build import upsert_docs
    from iscc_search_spark.plans.search import SearchIndex

    d = str(tmp_path / "lean2")
    build_index(
        spark, pages_df.limit(40), d, cfg=EngineConfig(),
        n_parts=2, n_shards=2, group_size=2, combo2=False,
    )
    cat = IndexCatalog(d)
    assert os.path.isdir(cat.simprint_bands)
    assert not os.path.isdir(cat.simprint_bands2)
    ix = SearchIndex(spark, d)
    txt = pages_df.orderBy("url").first()["text"][:300]
    assert ix.search_granular(txt, k=3, max_hamming=12).count() >= 1
    # upsert maintains the existing tables but does not create bands2
    delta = pages_df.limit(3).selectExpr(
        "url", "concat(text, ' changed') AS text", "lang"
    )
    upsert_docs(spark, delta, d, cfg=EngineConfig())
    assert not os.path.isdir(cat.simprint_bands2)


def test_term128_cache_never_exceeds_cap(monkeypatch):
    monkeypatch.setattr(sh, "_TERM128_CACHE_MAX", 8)
    sh._TERM128_CACHE.clear()
    terms = np.array([f"tok{i} tok{i+1}" for i in range(50)], dtype=object)
    out = sh._hash_terms_flat128([terms], len(terms))
    assert len(sh._TERM128_CACHE) <= 8
    # values still correct (spot-check one against the direct definition)
    hi, lo = sh.term_hash128(str(terms[17]))
    assert (int(out[17, 0]), int(out[17, 1])) == (hi, lo)
    sh._TERM128_CACHE.clear()
