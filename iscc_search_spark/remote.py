"""S7 client side — RemoteIndex: the named-index protocol over HTTP.

Mirrors the reference's RemoteIndex client semantics
(iscc_search/remote/client.py:95-267): /indexes CRUD, batched asset
ingest in chunks of ``chunk_size`` (default 100, client.py:159-190), and
up to ``max_retries`` attempts with exponential backoff on TRANSPORT
errors only — connection/timeout failures between client and server
(client.py:206-225).  HTTP status responses are application errors and
are NEVER retried; they map back to the same exceptions the local
IndexManager raises (400 -> ValueError, 404 -> FileNotFoundError,
409 -> FileExistsError, 401/403 -> PermissionError, else RuntimeError),
so callers can swap IndexManager and RemoteIndex without changing error
handling.  ``api_key`` is sent as the reference's ``X-API-Key`` header
(server/auth.py:10); auth failures are application errors, so a wrong
key costs exactly one request — no backoff loop against a 401.

stdlib urllib only (zero new dependencies, same discipline as server.py);
``opener`` is injectable for tests to fault-inject transient failures.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request

TRANSIENT_ERRORS = (
    urllib.error.URLError,  # DNS/conn-refused/reset (NOT HTTPError, see below)
    ConnectionError,
    TimeoutError,
)


class RemoteIndex:
    def __init__(
        self,
        base_url: str,
        chunk_size: int = 100,
        max_retries: int = 3,
        base_delay: float = 1.0,
        timeout: float = 300.0,
        opener=urllib.request.urlopen,
        api_key: str | None = None,
    ):
        if max_retries < 1:
            # the attempt loop must execute at least once — with 0 it
            # would fall through to `raise last` with last=None (a
            # confusing TypeError instead of a transport error)
            raise ValueError("max_retries must be >= 1")
        self.base_url = base_url.rstrip("/")
        self.chunk_size = chunk_size
        self.max_retries = max_retries
        self.base_delay = base_delay
        self.timeout = timeout
        self.api_key = api_key
        self._open = opener

    # --- transport -----------------------------------------------------------

    def _request(
        self,
        method: str,
        path: str,
        body=None,
        params: dict | None = None,
    ):
        url = self.base_url + path
        if params:
            url += "?" + urllib.parse.urlencode(params)
        data = None if body is None else json.dumps(body).encode("utf-8")
        last: Exception | None = None
        headers = {"Content-Type": "application/json"}
        if self.api_key is not None:
            headers["X-API-Key"] = self.api_key
        for attempt in range(1, self.max_retries + 1):
            req = urllib.request.Request(
                url, data=data, method=method, headers=headers,
            )
            try:
                with self._open(req, timeout=self.timeout) as resp:
                    raw = resp.read()
                    return json.loads(raw) if raw else None
            except urllib.error.HTTPError as e:
                # a response from the app: an application error — map it,
                # never retry (reference client.py:218: 4xx/5xx not retried)
                try:
                    msg = json.loads(e.read() or b"{}").get("error", str(e))
                except Exception:
                    msg = str(e)
                if e.code in (401, 403):
                    raise PermissionError(msg) from None
                if e.code == 400:
                    raise ValueError(msg) from None
                if e.code == 404:
                    raise FileNotFoundError(msg) from None
                if e.code == 409:
                    raise FileExistsError(msg) from None
                raise RuntimeError(f"HTTP {e.code}: {msg}") from None
            except TRANSIENT_ERRORS as e:
                last = e
                if attempt < self.max_retries:
                    time.sleep(self.base_delay * (2 ** (attempt - 1)))
        raise last  # transport kept failing after max_retries

    # --- registry (protocols/index.py:39-98) ---------------------------------

    def list_indexes(self) -> list[dict]:
        return self._request("GET", "/indexes")

    def create_index(self, name: str) -> dict:
        return self._request("POST", "/indexes", body={"name": name})

    def get_index(self, name: str) -> dict:
        return self._request("GET", f"/indexes/{name}")

    def delete_index(self, name: str) -> None:
        self._request("DELETE", f"/indexes/{name}")

    # --- ingest / query ------------------------------------------------------

    def add_assets(self, name: str, rows: list[dict]) -> list[dict]:
        """Batch ingest in chunks of ``chunk_size``; each chunk is one
        POST with independent retry (reference client.py:159-190)."""
        if not rows:
            return []
        results: list[dict] = []
        for i in range(0, len(rows), self.chunk_size):
            chunk = rows[i : i + self.chunk_size]
            out = self._request("POST", f"/indexes/{name}/assets", body=chunk)
            results.extend(out["results"])
        return results

    def get_asset(self, name: str, doc_id: int) -> dict:
        """Stored metadata of one indexed document (client.py:229-243);
        FileNotFoundError if the index or doc is unknown."""
        return self._request("GET", f"/indexes/{name}/assets/{doc_id}")

    def search(self, name: str, query: str, k: int = 10) -> list[dict]:
        return self._request(
            "GET", f"/indexes/{name}/search", params={"q": query, "k": k}
        )

    def stats(self, name: str) -> dict:
        return self._request("GET", f"/indexes/{name}/stats")
