"""Auth + aggregator-guard e2e over both server modes and the client
(reference: iscc_search/server/auth.py:10-45, tests/test_server_auth.py).

- public mode (api_secret=None): everything works unauthenticated;
- protected mode: missing/wrong X-API-Key -> 401 on every route except
  /health; valid key -> unchanged behavior; the RemoteIndex client sends
  the header and maps 401 to PermissionError WITHOUT retrying;
- aggregator mode: /indexes CRUD + ingest hidden (404), foreign-index
  reads hidden, aggregator-index reads allowed — and the suppression
  resolves before auth (key-less request to hidden route: 404, not 401).
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from iscc_search_spark.remote import RemoteIndex
from iscc_search_spark.server import serve_in_thread

SECRET = "test-secret-key-12345"


def _req(url: str, headers: dict | None = None, method: str = "GET", body=None):
    data = None if body is None else json.dumps(body).encode()
    h = {"Content-Type": "application/json", **(headers or {})}
    req = urllib.request.Request(url, data=data, method=method, headers=h)
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            raw = r.read()
            return r.status, json.loads(raw) if raw else None
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read() or b"{}")


@pytest.fixture(scope="module")
def protected(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("authroot"))
    srv, base = serve_in_thread(
        spark, base_path=root, api_secret=SECRET,
    )
    yield base
    srv.shutdown()


@pytest.fixture(scope="module")
def aggregator(spark, pages_df, tmp_path_factory):
    from iscc_search_spark.manager import IndexManager

    root = str(tmp_path_factory.mktemp("aggroot"))
    mgr = IndexManager(spark, root, n_parts=2, n_shards=2)
    mgr.create_index("idp")
    mgr.add_assets("idp", pages_df.limit(30))
    mgr.create_index("other")
    mgr.add_assets("other", pages_df.limit(10))
    srv, base = serve_in_thread(spark, base_path=root, aggregator_mode=True)
    yield base
    srv.shutdown()


def test_health_is_always_open(protected):
    assert _req(protected + "/health") == (200, {"status": "ok"})


def test_missing_and_wrong_key_401(protected):
    for headers in (None, {"X-API-Key": "wrong-key"}):
        code, body = _req(protected + "/indexes", headers=headers)
        assert code == 401 and body["error"] == "Unauthorized"
        code, _ = _req(
            protected + "/indexes", headers=headers, method="POST",
            body={"name": "nope"},
        )
        assert code == 401


def test_valid_key_happy_path(protected, pages_df):
    h = {"X-API-Key": SECRET}
    assert _req(protected + "/indexes", headers=h) == (200, [])
    code, info = _req(
        protected + "/indexes", headers=h, method="POST", body={"name": "auth"}
    )
    assert code == 201 and info["name"] == "auth"
    rows = [
        {"url": r["url"], "text": r["text"], "lang": r["lang"]}
        for r in pages_df.limit(12).collect()
    ]
    code, out = _req(
        protected + "/indexes/auth/assets", headers=h, method="POST", body=rows
    )
    assert code == 200 and len(out["results"]) == 12
    code, found = _req(protected + "/indexes/auth/search?q=the&k=3", headers=h)
    assert code == 200
    code, _ = _req(protected + "/indexes/auth", headers=h, method="DELETE")
    assert code == 204


def test_client_sends_key_and_maps_401_without_retry(protected):
    ok = RemoteIndex(protected, api_key=SECRET, base_delay=0.01)
    assert ok.list_indexes() == []

    calls = []

    def counting_opener(req, timeout=None):
        calls.append(req.full_url)
        return urllib.request.urlopen(req, timeout=timeout)

    bad = RemoteIndex(
        protected, api_key="wrong", base_delay=5.0, opener=counting_opener
    )
    with pytest.raises(PermissionError):
        bad.list_indexes()
    assert len(calls) == 1  # 401 is an application error: never retried

    keyless = RemoteIndex(protected, base_delay=0.01)
    with pytest.raises(PermissionError):
        keyless.create_index("x")


def test_aggregator_hides_mutating_surface(aggregator):
    # CRUD surface: route-hiding 404 regardless of method
    assert _req(aggregator + "/indexes")[0] == 404
    assert _req(aggregator + "/indexes", method="POST", body={"name": "x"})[0] == 404
    assert _req(aggregator + "/indexes/idp")[0] == 404
    assert _req(aggregator + "/indexes/idp", method="DELETE")[0] == 404
    # ingest suppressed
    code, _ = _req(
        aggregator + "/indexes/idp/assets", method="POST",
        body=[{"url": "u", "text": "t"}],
    )
    assert code == 404


def test_aggregator_reads_own_index_only(aggregator):
    code, rows = _req(aggregator + "/indexes/idp/search?q=the&k=3")
    assert code == 200
    code, st = _req(aggregator + "/indexes/idp/stats")
    assert code == 200 and st["n_docs"] == 30
    # foreign index: hidden, even though it exists
    assert _req(aggregator + "/indexes/other/search?q=the&k=3")[0] == 404
    assert _req(aggregator + "/indexes/other/stats")[0] == 404


def test_suppression_resolves_before_auth(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("aggauth"))
    srv, base = serve_in_thread(
        spark, base_path=root, api_secret=SECRET, aggregator_mode=True
    )
    try:
        # key-less request to a hidden endpoint: 404, never 401
        assert _req(base + "/indexes")[0] == 404
        # key-less request to an allowed read: 401 (auth still applies)
        assert _req(base + "/indexes/idp/stats")[0] == 401
    finally:
        srv.shutdown()
