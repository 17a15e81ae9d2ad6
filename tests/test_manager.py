"""S8 full: named-index manager CRUD + size accounting
(reference: iscc_search/indexes/usearch/manager.py:67-165,294-335)."""

import os

import pytest
from pyspark.sql import functions as F

from iscc_search_spark.manager import IndexManager, validate_index_name


@pytest.fixture()
def mgr(spark, tmp_path):
    return IndexManager(spark, str(tmp_path / "root"), n_parts=4, n_shards=4)


def test_name_validation():
    validate_index_name("myindex1")
    for bad in ("", "My", "1abc", "a_b", "a-b", "a.b", "ABC"):
        with pytest.raises(ValueError):
            validate_index_name(bad)


def test_create_list_get_delete(mgr, pages_df):
    assert mgr.list_indexes() == []
    info = mgr.create_index("alpha")
    assert info == {
        "name": "alpha", "assets": 0, "size": 0,
        "sizes": {"other": 0}, "size_bytes": info["size_bytes"],
        "sizes_bytes": info["sizes_bytes"],
    } or info["assets"] == 0
    with pytest.raises(FileExistsError):
        mgr.create_index("alpha")
    with pytest.raises(ValueError):
        mgr.create_index("Not-Valid")

    mgr.create_index("beta")
    # a stray non-index dir under the root is skipped
    os.makedirs(os.path.join(mgr.base_path, "notanindex"))
    names = [i["name"] for i in mgr.list_indexes()]
    assert names == ["alpha", "beta"]  # sorted, stray dir skipped

    got = mgr.get_index("alpha")
    assert got["assets"] == 0
    with pytest.raises(FileNotFoundError):
        mgr.get_index("missing")

    mgr.delete_index("beta")
    assert [i["name"] for i in mgr.list_indexes()] == ["alpha"]
    with pytest.raises(FileNotFoundError):
        mgr.delete_index("beta")


def test_ingest_sizes_and_open(mgr, spark, pages_df):
    mgr.create_index("corpus")
    with pytest.raises(FileNotFoundError):  # empty: nothing to open yet
        mgr.open("corpus")

    first = pages_df.limit(120)
    info = mgr.add_assets("corpus", first)
    assert info["assets"] == 120
    # per-component size accounting: every index component present, real
    # bytes, and the MB totals are floors of the byte totals
    for comp in ("docs", "postings", "term_stats"):
        assert info["sizes_bytes"][comp] > 0
    assert info["size_bytes"] == sum(info["sizes_bytes"].values())
    assert info["size"] == info["size_bytes"] // (1024 * 1024)

    # second batch is an incremental upsert; counts accumulate
    rest = pages_df.join(first.select("url"), "url", "left_anti")
    info2 = mgr.add_assets("corpus", rest)
    assert info2["assets"] == pages_df.count()
    assert info2["size_bytes"] >= info["size_bytes"]

    ix = mgr.open("corpus")
    st = ix.stats()
    assert st["n_docs"] == pages_df.count()

    # remove_assets drops docs and updates the registry's asset count
    drop = [r["url"] for r in pages_df.select("url").orderBy("url").limit(5).collect()]
    info3 = mgr.remove_assets("corpus", drop)
    assert info3["assets"] == pages_df.count() - 5


def test_non_string_name_is_value_error():
    for bad in (None, 7, ["a"], {"n": 1}):
        with pytest.raises(ValueError):
            validate_index_name(bad)
