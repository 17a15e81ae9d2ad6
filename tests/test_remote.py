"""S7 client + S8 registry e2e: RemoteIndex drives the named-index HTTP
surface end to end — CRUD, chunked batch ingest, search — and recovers
transparently from injected transient transport failures
(reference: iscc_search/remote/client.py:159-225,244-267)."""

from __future__ import annotations

import urllib.error
import urllib.request

import pytest

from iscc_search_spark.remote import RemoteIndex
from iscc_search_spark.server import serve_in_thread


@pytest.fixture(scope="module")
def registry(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("registry_root"))
    srv, base = serve_in_thread(spark, base_path=root)
    # small build geometry for the manager behind the server
    srv.app.manager.n_parts = 4
    srv.app.manager.n_shards = 4
    yield base
    srv.shutdown()


def _rows(pages_df, n, skip=0):
    return [
        {"url": r["url"], "text": r["text"], "lang": r["lang"]}
        for r in pages_df.orderBy("url").collect()[skip : skip + n]
    ]


def test_registry_crud_and_chunked_ingest(registry, pages_df):
    c = RemoteIndex(registry, chunk_size=100, base_delay=0.01)
    assert c.list_indexes() == []

    info = c.create_index("web")
    assert info["name"] == "web" and info["assets"] == 0
    with pytest.raises(FileExistsError):
        c.create_index("web")
    with pytest.raises(ValueError):
        c.create_index("Not-Valid")
    with pytest.raises(FileNotFoundError):
        c.get_index("nope")

    # 250 rows with chunk_size=100 -> 3 POSTed chunks, all acked
    rows = _rows(pages_df, 150)
    results = c.add_assets("web", rows)
    assert len(results) == 150
    assert all(r["status"] == "ok" for r in results)
    assert c.get_index("web")["assets"] == 150
    st = c.stats("web")
    assert st["n_docs"] == 150 and st["n_terms"] > 0

    hits = c.search("web", "t00001", k=5)
    assert hits and all("doc_id" in h and "score" in h for h in hits)

    # second batch upserts incrementally
    more = _rows(pages_df, 50, skip=150)
    c.add_assets("web", more)
    assert c.get_index("web")["assets"] == 200

    c.delete_index("web")
    assert c.list_indexes() == []
    with pytest.raises(FileNotFoundError):
        c.delete_index("web")


def test_client_retries_transient_transport_errors(registry, pages_df):
    """Connection-level failures are retried with exponential backoff and
    recover transparently; the failure count is visible to the test."""
    fails = {"left": 2, "seen": 0}

    def flaky_opener(req, timeout=None):
        if fails["left"] > 0:
            fails["left"] -= 1
            fails["seen"] += 1
            raise urllib.error.URLError(ConnectionResetError("injected"))
        return urllib.request.urlopen(req, timeout=timeout)

    c = RemoteIndex(
        registry, chunk_size=100, max_retries=3, base_delay=0.01,
        opener=flaky_opener,
    )
    c.create_index("flaky")
    out = c.add_assets("flaky", _rows(pages_df, 30))
    assert len(out) == 30 and fails["seen"] == 2  # 2 failures absorbed
    assert c.get_index("flaky")["assets"] == 30
    c.delete_index("flaky")


def test_client_exhausts_retries_then_raises():
    def dead_opener(req, timeout=None):
        raise urllib.error.URLError(ConnectionRefusedError("down"))

    c = RemoteIndex(
        "http://127.0.0.1:1", max_retries=3, base_delay=0.01,
        opener=dead_opener,
    )
    with pytest.raises(urllib.error.URLError):
        c.list_indexes()


def test_application_errors_not_retried(registry):
    """HTTP status errors map to exceptions WITHOUT retry (a 404 must not
    burn the backoff budget)."""
    calls = {"n": 0}

    def counting_opener(req, timeout=None):
        calls["n"] += 1
        return urllib.request.urlopen(req, timeout=timeout)

    c = RemoteIndex(registry, base_delay=5.0, opener=counting_opener)
    with pytest.raises(FileNotFoundError):
        c.get_index("ghost")
    assert calls["n"] == 1  # exactly one request, no retries


def test_get_asset_roundtrip(registry, pages_df):
    c = RemoteIndex(registry, base_delay=0.01)
    c.create_index("assets")
    rows = _rows(pages_df, 20)
    c.add_assets("assets", rows)
    from iscc_search_spark.corpus import doc_id_for_url

    did = doc_id_for_url(rows[0]["url"])
    doc = c.get_asset("assets", did)
    assert doc["doc_id"] == did and doc["url"] == rows[0]["url"]
    assert doc["doc_len"] > 0
    with pytest.raises(FileNotFoundError):
        c.get_asset("assets", 12345)
    with pytest.raises(FileNotFoundError):
        c.get_asset("ghost", did)
    c.delete_index("assets")
