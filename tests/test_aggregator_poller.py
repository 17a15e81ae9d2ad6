"""Aggregator poll-loop orchestration e2e (reference:
iscc_search/aggregator/poller.py:89-230, hublist.py:20-59;
tests/test_aggregator_poller.py, test_aggregator_hublist.py).

Simulates two hubs behind an injectable fetch: initial backfill, growth,
a failing bundle (progress kept, hub unhealthy, recovery), a checkpoint
tree-size regression (re-backfill from 0), deletion tombstones, hub-list
refresh failure (last-known-good kept), decommission pruning, and the
public /status endpoint — cursor-correct at every step.
"""

from __future__ import annotations

import json
import urllib.request

import pytest

from iscc_search_spark.aggregator import (
    Hub,
    Poller,
    parse_hub_list,
    poll_hub_once,
    record_to_page,
)
from iscc_search_spark.manager import IndexManager
from iscc_search_spark.sources.tlog import TILE_RECORDS


def _frame(recs: list[bytes]) -> bytes:
    return b"".join(len(r).to_bytes(2, "big") + r for r in recs)


class FakeHub:
    def __init__(self, records: list[bytes]):
        self.records = records
        self.fail_bundles: set[int] = set()  # bundle idx -> raise on fetch

    def serve(self, path: str) -> bytes:
        if path == "checkpoint":
            return f"hub.test\n{len(self.records)}\nabc=\n\nsig\n".encode()
        assert path.startswith("tile/entries/")
        rest = path[len("tile/entries/"):]
        width = 0
        if ".p/" in rest:
            rest, w = rest.split(".p/")
            width = int(w)
        idx = int("".join(g.lstrip("x") for g in rest.split("/")))
        if idx in self.fail_bundles:
            raise ConnectionError(f"injected failure for bundle {idx}")
        lo = idx * TILE_RECORDS
        return _frame(self.records[lo : lo + (width or TILE_RECORDS)])


def _rec(hub: str, i: int, text: str | None = None) -> bytes:
    body = f"agg document {hub} number {i} zzagg" if text is None else text
    return f"http://{hub}.test/doc{i}\t{body}\ten".encode()


HUBLIST = """\
version: 1
network: mainnet
hubs:
  - hub_id: 1
    url: http://hub1.test
    active: true
  - hub_id: 2
    url: http://hub2.test
    active: true
  - hub_id: 9
    url: http://dead.test
    active: false
"""


# --- pure units ---------------------------------------------------------------


def test_parse_hub_list_active_and_errors():
    hubs = parse_hub_list(HUBLIST, "mainnet")
    assert hubs == [Hub(1, "http://hub1.test"), Hub(2, "http://hub2.test")]
    with pytest.raises(ValueError, match="network mismatch"):
        parse_hub_list(HUBLIST, "testnet")
    with pytest.raises(ValueError, match="not a mapping"):
        parse_hub_list("- just\n- a list\n", "mainnet")
    assert parse_hub_list("network: mainnet\nhubs: []\n", "mainnet") == []


def test_record_to_page_taxonomy():
    assert record_to_page(b"http://a\tbody text\ten", "mainnet") == (
        ("http://a", "body text", "en"), "ok",
    )
    assert record_to_page(b"http://a\tbody", "mainnet")[1] == "ok"  # lang default
    row, reason = record_to_page(b"http://a\t", "mainnet")
    assert reason == "deletion" and row == ("http://a", None, None)
    assert record_to_page(b"\xff\xfe garbage", "mainnet")[1] == "malformed"
    assert record_to_page(b"no tabs at all", "mainnet")[1] == "malformed"
    assert record_to_page(b"http://a\tbody\ten\ttestnet", "mainnet")[1] == "realm_mismatch"
    assert record_to_page(b"http://a\tbody\ten\tmainnet", "mainnet")[1] == "ok"


def test_poll_hub_once_partial_resume():
    """Cursor mid-partial-bundle: only the unseen suffix reaches the sink."""
    hub_obj = FakeHub([_rec("solo", i) for i in range(10)])
    got = []

    def fetch(url):
        return hub_obj.serve(url.split("/log/", 1)[1])

    def sink(entries, deletions):
        got.extend(entries)

    res = poll_hub_once(fetch, Hub(1, "http://solo.test"), 6, sink, "mainnet")
    assert res.last_size == 10 and res.error is None
    assert res.counts["ok"] == 4
    assert [e[0] for e in got] == [f"http://solo.test/doc{i}" for i in range(6, 10)]


# --- the two-hub saga ---------------------------------------------------------


def test_two_hub_saga(spark, tmp_path):
    hubs = {
        "http://hub1.test": FakeHub([_rec("hub1", i) for i in range(TILE_RECORDS + 44)]),
        "http://hub2.test": FakeHub([_rec("hub2", i) for i in range(10)]),
    }

    def fetch(url):
        base, path = url.split("/log/", 1)
        return hubs[base].serve(path)

    hublist_path = tmp_path / "mainnet.yaml"
    hublist_path.write_text(HUBLIST)
    mgr = IndexManager(spark, str(tmp_path / "root"), n_parts=2, n_shards=2)
    p = Poller(mgr, "agg", str(hublist_path), network="mainnet", fetch=fetch)

    # 1. initial backfill: both hubs drained, cursor == tree size
    p.poll_cycle()
    assert p.status[1].cursor == TILE_RECORDS + 44 and p.status[1].ok
    assert p.status[2].cursor == 10 and p.status[2].ok
    assert p.status[1].counts["ok"] == TILE_RECORDS + 44
    assert mgr.get_index("agg")["assets"] == TILE_RECORDS + 54
    hits = mgr.open("agg").search("zzagg", k=5, with_metadata=False).collect()
    assert len(hits) == 5

    # 2. idle cycle: nothing grows, cursors unchanged, no double count
    p.poll_cycle()
    assert p.status[1].cursor == TILE_RECORDS + 44
    assert p.status[1].counts["ok"] == TILE_RECORDS + 44

    # 3. growth on hub1 (+5 into the partial bundle)
    hubs["http://hub1.test"].records.extend(
        _rec("hub1", TILE_RECORDS + 44 + i) for i in range(5)
    )
    p.poll_cycle()
    assert p.status[1].cursor == TILE_RECORDS + 49
    assert mgr.get_index("agg")["assets"] == TILE_RECORDS + 59

    # 4. failing bundle on hub2: progress kept, hub unhealthy, isolated
    hubs["http://hub2.test"].records.extend(_rec("hub2", 10 + i) for i in range(3))
    hubs["http://hub2.test"].fail_bundles.add(0)
    p.poll_cycle()
    assert p.status[2].cursor == 10  # kept, not reset
    assert not p.status[2].ok and "bundle 0 failed" in p.status[2].error
    assert p.status[1].ok  # other hub untouched

    # 5. recovery: failure cleared, next poll resumes at the cursor
    hubs["http://hub2.test"].fail_bundles.clear()
    p.poll_cycle()
    assert p.status[2].cursor == 13 and p.status[2].ok and p.status[2].error is None

    # 6. checkpoint regression on hub2 (db reset to 4 records):
    #    this poll resets the cursor to 0; the next re-backfills
    hubs["http://hub2.test"].records = [_rec("hub2", i) for i in range(4)]
    p.poll_cycle()
    assert p.status[2].cursor == 0 and p.status[2].ok
    p.poll_cycle()
    assert p.status[2].cursor == 4  # idempotent re-upsert of known urls
    assert mgr.get_index("agg")["assets"] == TILE_RECORDS + 62

    # 7. deletion tombstone for an indexed url removes the doc
    before = mgr.get_index("agg")["assets"]
    hubs["http://hub1.test"].records.append(b"http://hub1.test/doc3\t\ten")
    p.poll_cycle()
    assert p.status[1].counts["deletion"] == 1
    assert mgr.get_index("agg")["assets"] == before - 1

    # 8. hub-list refresh failure: last-known-good list kept, polls go on
    hublist_path.write_text(":::: not yaml [")
    p._next_refresh = 0.0
    p.poll_cycle()
    assert set(p.status) == {1, 2}  # nothing pruned, both still polled

    # 9. decommission hub2: a NON-empty refresh prunes its status row
    hublist_path.write_text(HUBLIST.replace(
        "  - hub_id: 2\n    url: http://hub2.test\n    active: true\n", ""
    ))
    p._next_refresh = 0.0
    p.poll_cycle()
    assert set(p.status) == {1}

    # 10. an EMPTY refresh prunes nothing (transient empties keep cursors)
    hublist_path.write_text("version: 1\nnetwork: mainnet\nhubs: []\n")
    p._next_refresh = 0.0
    p.poll_cycle()
    assert set(p.status) == {1} and p.status[1].cursor > 0


def test_cli_aggregate_once_over_real_http(spark, tmp_path, capsys):
    """`aggregate --once` drives the whole chain over REAL HTTP: a live
    hub server -> default_fetch -> Poller -> named-index upsert."""
    import http.server
    import threading

    hub_obj = FakeHub([_rec("clihub", i) for i in range(5)])

    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            try:
                body = hub_obj.serve(self.path.split("/log/", 1)[1])
            except Exception:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    hub_srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=hub_srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{hub_srv.server_address[1]}"
    hl = tmp_path / "hl.yaml"
    hl.write_text(
        "version: 1\nnetwork: mainnet\nhubs:\n"
        f"  - hub_id: 3\n    url: {url}\n    active: true\n"
    )
    try:
        from iscc_search_spark.cli import main

        assert main([
            "aggregate", "--root", str(tmp_path / "root"),
            "--hub-list", str(hl), "--once",
        ]) == 0
        data = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert data["hubs"][0]["cursor"] == 5 and data["hubs"][0]["ok"]
        from iscc_search_spark.manager import IndexManager

        mgr = IndexManager(spark, str(tmp_path / "root"))
        assert mgr.get_index("idp")["assets"] == 5
    finally:
        hub_srv.shutdown()


def test_status_endpoint(spark, tmp_path):
    from iscc_search_spark.server import serve_in_thread

    hub_obj = FakeHub([_rec("solo", i) for i in range(6)])
    hubs = {"http://solo.test": hub_obj}

    def fetch(url):
        base, path = url.split("/log/", 1)
        return hubs[base].serve(path)

    hublist_path = tmp_path / "net.yaml"
    hublist_path.write_text(
        "version: 1\nnetwork: mainnet\nhubs:\n"
        "  - hub_id: 7\n    url: http://solo.test\n    active: true\n"
    )
    mgr = IndexManager(spark, str(tmp_path / "root"), n_parts=2, n_shards=2)
    p = Poller(mgr, "agg", str(hublist_path), network="mainnet", fetch=fetch)
    p.poll_cycle()
    hub_obj.fail_bundles.add(0)
    hub_obj.records.extend(_rec("solo", 6 + i) for i in range(2))
    p.poll_cycle()  # leaves hub 7 unhealthy with a raw error string

    srv, base = serve_in_thread(
        spark, base_path=mgr.base_path, api_secret="sekrit",
        aggregator_mode=True, aggregator_index="agg", poller=p,
    )
    try:
        # public: no key needed, like /health
        with urllib.request.urlopen(base + "/status", timeout=60) as r:
            body = json.loads(r.read())
        assert body["mode"] == "aggregator" and body["index"] == "agg"
        assert body["assets"] == 6
        (hub_row,) = body["hubs"]
        assert hub_row["hub_id"] == 7 and hub_row["cursor"] == 6
        assert not hub_row["ok"]
        assert hub_row["error"] == "poll failed"  # sanitized, never raw
        assert "T" in hub_row["last_poll"]  # ISO-8601
    finally:
        srv.shutdown()
