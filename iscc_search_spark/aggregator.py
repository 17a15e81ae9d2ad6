"""Aggregator poll-loop orchestration — the loop around the tlog decode.

Mirrors the reference's IDP aggregator semantics
(iscc_search/aggregator/poller.py:43-59 HubStatus, 62-86 planning,
89-145 per-hub poll, 147-230 loop + hub-list lifecycle;
aggregator/hublist.py:20-36 the authoritative {network}.yaml): a
multi-hub registry with per-hub cursors, periodic hub-list refresh that
prunes decommissioned hubs, checkpoint tree-size regression handled as
re-backfill-from-0, per-hub failure isolation, and a shared status
mapping a /status endpoint reads concurrently.

Re-expressed without the reference's asyncio/httpx/msgspec stack:
synchronous driver-side loop (polling is control-plane work — bounded
<=256-record bursts per bundle), ``fetch(url) -> bytes`` injectable for
tests, dataclasses for the status structs.  The data plane stays Spark:
each bundle's converted records become one small DataFrame upserted
through the named-index manager (operators/build.py upsert path), so
ingestion is at-least-once and idempotent exactly like the reference's
``add_assets`` contract — a restart or re-backfill re-upserts the same
url keys.

Record wire format (matching the repo's tlog composition fixtures):
UTF-8 ``url \\t text [\\t lang [\\t network]]``.  Classification mirrors
aggregator/entry.py:54-110's reason taxonomy: undecodable/short ->
``malformed``; empty text -> ``deletion`` (a tombstone: the url is
removed from the index); a fourth field naming a different network ->
``realm_mismatch``; else ``ok``.
"""

from __future__ import annotations

import threading
import time
import urllib.request
from dataclasses import dataclass, field
from pathlib import Path

import yaml

from iscc_search_spark.sources.tlog import (
    TILE_RECORDS,
    checkpoint_tree_size,
    decode_entry_bundle,
    entry_bundle_path,
    fetch_plan,
)

REASONS = ("ok", "deletion", "malformed", "realm_mismatch")

HTTP_TIMEOUT = 30.0


def default_fetch(url: str, timeout: float = HTTP_TIMEOUT) -> bytes:
    with urllib.request.urlopen(url, timeout=timeout) as r:
        if r.status >= 400:
            raise OSError(f"HTTP {r.status} for {url}")
        return r.read()


@dataclass(frozen=True)
class Hub:
    """Active hub entry from the {network}.yaml hub list."""

    hub_id: int
    url: str


@dataclass(frozen=True)
class PollResult:
    """Outcome of polling one hub: new cursor + per-reason counts;
    ``error`` carries a bundle-level failure that stopped the poll early
    (progress made is kept, but the hub is not healthy)."""

    last_size: int
    counts: dict[str, int]
    error: str | None = None


@dataclass
class HubStatus:
    """Mutable per-hub ingestion status shared between the poll loop and
    the /status endpoint.  ``cursor`` is the source of truth for poll
    progress; ``counts`` are cumulative since process start and
    double-count after a regression re-backfill (accepted — the cursor
    stays truthful, and upserts are idempotent)."""

    hub_id: int
    url: str
    cursor: int = 0
    last_poll: float | None = None
    ok: bool = True
    error: str | None = None
    counts: dict[str, int] = field(default_factory=dict)

    def as_row(self) -> dict:
        return {
            "hub_id": self.hub_id, "url": self.url, "cursor": self.cursor,
            "last_poll": self.last_poll, "ok": self.ok, "error": self.error,
            "counts": dict(self.counts),
        }


# --- hub list (hublist.py:20-59) ----------------------------------------------


def parse_hub_list(data: bytes | str, network: str) -> list[Hub]:
    """Active hubs from the hub-list YAML ({version, network, hubs});
    a non-mapping document or a network mismatch is rejected."""
    parsed = yaml.safe_load(data)
    if not isinstance(parsed, dict):
        raise ValueError("hub list is not a mapping")
    if parsed.get("network") != network:
        raise ValueError(
            f"hub list network mismatch: expected {network}, "
            f"got {parsed.get('network')}"
        )
    hubs = parsed.get("hubs") or []
    return [Hub(hub_id=h["hub_id"], url=h["url"]) for h in hubs if h.get("active")]


def load_hub_list(source: str, network: str, fetch=default_fetch) -> list[Hub]:
    """http(s) URL -> fetched; anything else -> local file path."""
    if source.startswith(("http://", "https://")):
        data: bytes | str = fetch(source)
    else:
        data = Path(source).read_text(encoding="utf-8")
    return parse_hub_list(data, network)


# --- record conversion (entry.py:54-110 analogue) ----------------------------


def record_to_page(record: bytes, network: str) -> tuple[tuple | None, str]:
    """(converted_row, reason); row is (url, text, lang) for ``ok``,
    (url, None, None) for ``deletion`` (tombstone), None otherwise."""
    try:
        text_fields = record.decode("utf-8").split("\t")
    except UnicodeDecodeError:
        return None, "malformed"
    if len(text_fields) < 2 or not text_fields[0]:
        return None, "malformed"
    url, body = text_fields[0], text_fields[1]
    lang = text_fields[2] if len(text_fields) > 2 and text_fields[2] else "und"
    realm = text_fields[3] if len(text_fields) > 3 else network
    if realm != network:
        return None, "realm_mismatch"
    if not body:
        return (url, None, None), "deletion"
    return (url, body, lang), "ok"


# --- per-hub poll (poller.py:89-145) ------------------------------------------


def poll_hub_once(
    fetch,
    hub: Hub,
    last_size: int,
    sink,
    network: str,
    stop_event: threading.Event | None = None,
) -> PollResult:
    """Read the hub checkpoint and ingest new records bundle by bundle.

    A checkpoint tree-size regression (hub database reset) returns
    cursor 0 so the NEXT poll re-backfills (idempotent upserts make the
    replay safe).  A failing bundle stops the poll but keeps the
    progress made, surfacing the failure via ``PollResult.error``.
    ``sink(entries, deletions)`` receives one bundle's worth (<=256) of
    converted rows — bounded on-loop bursts, like the reference's
    per-bundle await."""
    checkpoint = fetch(f"{hub.url}/log/checkpoint")
    if isinstance(checkpoint, bytes):
        checkpoint = checkpoint.decode("utf-8")
    tree_size = checkpoint_tree_size(checkpoint)
    counts = dict.fromkeys(REASONS, 0)
    if tree_size < last_size:
        return PollResult(last_size=0, counts=counts)
    processed = last_size
    for bundle_index, width in fetch_plan(last_size, tree_size):
        if stop_event is not None and stop_event.is_set():
            break
        try:
            data = fetch(f"{hub.url}/log/{entry_bundle_path(bundle_index, width)}")
            records = decode_entry_bundle(data)
            expected = width or TILE_RECORDS
            if len(records) != expected:
                raise ValueError(
                    f"bundle has {len(records)} records, expected {expected}"
                )
            bundle_start = bundle_index * TILE_RECORDS
            entries, deletions = [], []
            for record in records[max(last_size - bundle_start, 0):]:
                row, reason = record_to_page(record, network)
                counts[reason] += 1
                if reason == "ok":
                    entries.append(row)
                elif reason == "deletion":
                    deletions.append(row[0])
            sink(entries, deletions)
        except Exception as exc:
            return PollResult(
                last_size=processed, counts=counts,
                error=f"bundle {bundle_index} failed: {exc}",
            )
        processed = min((bundle_index + 1) * TILE_RECORDS, tree_size)
    return PollResult(last_size=processed, counts=counts)


# --- the loop (poller.py:147-230) ---------------------------------------------


class Poller:
    """Multi-hub aggregator over a named-index manager.

    ``poll_cycle()`` is one deterministic pass (hub-list refresh if due +
    one poll per hub) — tests drive it directly; ``run()`` wraps it in
    the stop-event sleep loop.  ``status`` maps hub_id -> HubStatus and
    is what the server's /status endpoint reports."""

    def __init__(
        self,
        manager,
        index_name: str,
        hub_source: str,
        network: str = "mainnet",
        fetch=default_fetch,
        poll_interval: float = 30.0,
        refresh_interval: float = 3600.0,
    ):
        self.manager = manager
        self.index_name = index_name
        self.hub_source = hub_source
        self.network = network
        self.fetch = fetch
        self.poll_interval = poll_interval
        self.refresh_interval = refresh_interval
        self.status: dict[int, HubStatus] = {}
        self.stop_event = threading.Event()
        self._hubs: list[Hub] = []
        self._next_refresh = 0.0
        # the aggregator owns its derived index: register on first use
        try:
            manager.create_index(index_name)
        except FileExistsError:
            pass

    # --- sink: one bundle's records into the Spark index ---------------------

    def _sink(self, entries: list[tuple], deletions: list[str]) -> None:
        if entries:
            df = self.manager.spark.createDataFrame(
                entries, "url string, text string, lang string"
            )
            self.manager.add_assets(self.index_name, df)
        if deletions:
            meta_assets = self.manager.get_index(self.index_name)["assets"]
            if meta_assets:  # tombstones before any build are no-ops
                self.manager.remove_assets(self.index_name, deletions)

    # --- hub-list lifecycle ---------------------------------------------------

    def refresh_hubs(self, now: float | None = None) -> None:
        """Refresh if due.  Failure keeps the last-known-good list and
        retries at the short poll interval; an empty list is benign idle
        and prunes nothing (a transient empty refresh must not discard
        cursors and force a full re-backfill); a NON-empty refresh prunes
        decommissioned hubs from the status mapping — the set difference
        (U4) on live orchestration state."""
        now = time.monotonic() if now is None else now
        if now < self._next_refresh:
            return
        try:
            hubs = load_hub_list(self.hub_source, self.network, self.fetch)
            if not hubs:
                self._next_refresh = now + self.poll_interval
            else:
                self._hubs = hubs
                for stale_id in set(self.status) - {h.hub_id for h in hubs}:
                    del self.status[stale_id]
                self._next_refresh = now + self.refresh_interval
        except Exception:
            self._next_refresh = now + self.poll_interval

    # --- one pass -------------------------------------------------------------

    def poll_cycle(self) -> None:
        self.refresh_hubs()
        for hub in self._hubs:
            if self.stop_event.is_set():
                break
            st = self.status.setdefault(hub.hub_id, HubStatus(hub.hub_id, hub.url))
            st.url = hub.url  # a refresh may relocate the hub
            st.last_poll = time.time()
            try:
                result = poll_hub_once(
                    self.fetch, hub, st.cursor, self._sink, self.network,
                    self.stop_event,
                )
                st.cursor = result.last_size
                for reason, n in result.counts.items():
                    st.counts[reason] = st.counts.get(reason, 0) + n
                st.ok = result.error is None
                st.error = result.error
            except Exception as exc:  # checkpoint fetch/parse: isolate the hub
                st.ok = False
                st.error = str(exc)

    def run(self) -> None:
        """Blocking loop; call ``stop()`` (or set stop_event) to exit."""
        while not self.stop_event.is_set():
            self.poll_cycle()
            self.stop_event.wait(self.poll_interval)

    def stop(self) -> None:
        self.stop_event.set()

    def status_rows(self) -> list[dict]:
        return [self.status[k].as_row() for k in sorted(self.status)]
