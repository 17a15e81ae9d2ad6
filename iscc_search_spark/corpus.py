"""Deterministic synthetic ``pages`` corpus (FIXTURES.md §1).

Shape mandated by BASELINE.json input_hint:
    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Everything is a pure function of (n_docs, seed): Zipfian vocabulary
(|V|=10,000, s=1.07, token = t{rank:05d}), doc lengths 50-500, 2 unique salt
tokens per doc, 5% seeded near-duplicates (90% token overlap) to exercise the
simhash near-dup filter, lang 95% en / rest de+fr, html = literal wrapper
around utf-8 text so extraction is verifiable byte-identically.

Determinism discipline mirrors the reference's pinned-timestamp fixtures
(/root/reference/tests/conftest.py:71-79): numpy Generator(seed), no
wall-clock, no ``random`` module.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB_SIZE = 10_000
ZIPF_S = 1.07
MIN_LEN, MAX_LEN = 50, 500
NEAR_DUP_FRAC = 0.05
NEAR_DUP_MUTATE = 0.10  # fraction of tokens replaced in a near-dup copy
EPOCH = datetime(2026, 1, 1, tzinfo=timezone.utc)

_HTML_PREFIX = b"<html><body>"
_HTML_SUFFIX = b"</body></html>"


def doc_id_for_url(url: str) -> int:
    """First 8 bytes of blake2b(url) as big-endian *signed* long.

    Partition-independent and deterministic (SURVEY.md §7.5 item 4 — never
    monotonically_increasing_id).
    """
    d = hashlib.blake2b(url.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(d, "big", signed=True)


def _vocab() -> list[str]:
    return [f"t{r:05d}" for r in range(VOCAB_SIZE)]


def _zipf_probs() -> np.ndarray:
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    p = 1.0 / ranks**ZIPF_S
    return p / p.sum()


def _generate_core(n_docs: int, seed: int) -> tuple[pa.Table, list[tuple[int, int]]]:
    rng = np.random.default_rng(seed)
    vocab = _vocab()
    probs = _zipf_probs()

    lengths = rng.integers(MIN_LEN, MAX_LEN + 1, size=n_docs)
    total = int(lengths.sum())
    flat = rng.choice(VOCAB_SIZE, size=total, p=probs)
    offsets = np.concatenate([[0], np.cumsum(lengths)])
    token_lists: list[np.ndarray] = [
        flat[offsets[i] : offsets[i + 1]] for i in range(n_docs)
    ]

    # near-duplicates: seeded fraction copy an earlier doc, mutate ~10% of
    # positions (keeps the simhash within a few bits of the source)
    n_dups = int(n_docs * NEAR_DUP_FRAC)
    pairs: list[tuple[int, int]] = []
    if n_dups and n_docs > 1:
        dup_targets = rng.choice(np.arange(1, n_docs), size=n_dups, replace=False)
        for t in sorted(int(x) for x in dup_targets):
            src = int(rng.integers(0, t))
            toks = token_lists[src].copy()
            n_mut = max(1, int(len(toks) * NEAR_DUP_MUTATE))
            pos = rng.choice(len(toks), size=n_mut, replace=False)
            toks[pos] = rng.choice(VOCAB_SIZE, size=n_mut, p=probs)
            token_lists[t] = toks
            pairs.append((src, t))

    lang_u = rng.random(n_docs)
    lang_v = rng.random(n_docs)
    langs = np.where(lang_u < 0.95, "en", np.where(lang_v < 0.5, "de", "fr"))

    urls, texts, htmls, ts = [], [], [], []
    for i in range(n_docs):
        site = i % 97
        url = f"https://example{site}.test/p/{i}"
        # 2 per-doc salt tokens (unique rare terms per doc)
        words = [vocab[t] for t in token_lists[i]] + [f"u{i}xa", f"u{i}xb"]
        text = " ".join(words)
        urls.append(url)
        texts.append(text)
        htmls.append(_HTML_PREFIX + text.encode("utf-8") + _HTML_SUFFIX)
        ts.append(EPOCH + timedelta(seconds=i))

    table = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us", tz="UTC")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs.tolist(), pa.string()),
        }
    )
    return table, pairs


def generate_pages(n_docs: int, seed: int = 42) -> pa.Table:
    return _generate_core(n_docs, seed)[0]


def near_dup_pairs(n_docs: int, seed: int = 42) -> list[tuple[int, int]]:
    """The seeded (source_idx, dup_idx) pairs, for test assertions."""
    return _generate_core(n_docs, seed)[1]


def write_pages(path: str, n_docs: int, seed: int = 42) -> None:
    # small row groups so Spark can split the file into parallel scan tasks
    # (a single default-size row group serializes every downstream stage)
    pq.write_table(generate_pages(n_docs, seed), path, row_group_size=2048)


# --- reference query set (FIXTURES.md §2) -----------------------------------


def generate_queries(n_queries: int = 100, seed: int = 42) -> list[str]:
    """Deterministic query mix: 40% 1-term, 40% 2-3 term, 20% 5-term;
    head/torso/tail zipf-zone coverage; last 5 queries out-of-vocabulary
    (empty-result case, cf. reference tests/test_server_search.py:33)."""
    rng = np.random.default_rng(seed + 1)
    vocab = _vocab()
    zones = [
        np.arange(0, 50),  # head
        np.arange(50, 2000),  # torso
        np.arange(2000, VOCAB_SIZE),  # tail
    ]
    queries: list[str] = []
    for _ in range(max(0, n_queries - 5)):
        u = rng.random()
        n_terms = 1 if u < 0.4 else (int(rng.integers(2, 4)) if u < 0.8 else 5)
        terms = [
            vocab[int(rng.choice(zones[int(rng.integers(0, 3))]))]
            for _ in range(n_terms)
        ]
        queries.append(" ".join(terms))
    for j in range(min(5, n_queries)):
        queries.append(f"zzoov{j}xq zzoov{j}xr")
    return queries
