"""ISCC-style 64-bit CONTENT-TEXT simhash — the preserved identity feature.

The reference derives similarity-preserving binary fingerprints per content
segment and scores them with hamming similarity 1 - d/ndim
(iscc_search/indexes/simprint/usearch_core.py:180-182).  Here the whole
document gets one 64-bit simhash over its (term, tf) vector; near-duplicate
retrieval is a banded-LSH self-join (operators/neardup.py) instead of HNSW.

Semantics (frozen, shared with the DuckDB oracle SQL):
- token hash h(term) = first 16 hex chars of md5(term) as uint64 (big-endian)
- v_i = sum over terms of tf * (2*bit_i(h) - 1),  bit_i = (h >> (63-i)) & 1
- simhash bit i = 1 iff v_i > 0; result is the signed-int64 view.

The kernel is batch-vectorized: all terms of an Arrow batch are flattened,
md5 runs once per *unique* term (process-lifetime cache), the ±tf bit matrix
is a single numpy einsum-style reduction with np.add.reduceat per doc.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_TERM_HASH_CACHE: dict[str, int] = {}
_BITPOS = np.arange(63, -1, -1, dtype=np.uint64)  # bit 0 = MSB


def term_hash64(term: str) -> int:
    """uint64 from the first 8 bytes of md5(term)."""
    h = _TERM_HASH_CACHE.get(term)
    if h is None:
        h = int.from_bytes(hashlib.md5(term.encode("utf-8")).digest()[:8], "big")
        _TERM_HASH_CACHE[term] = h
    return h


def simhash_from_tf(terms: list[str] | np.ndarray, tfs: np.ndarray) -> int:
    """Single-doc simhash (oracle path)."""
    if len(terms) == 0:
        return 0
    hs = np.array([term_hash64(t) for t in terms], dtype=np.uint64)
    tf = np.asarray(tfs, dtype=np.int64)
    bits = ((hs[:, None] >> _BITPOS[None, :]) & _U1).astype(np.int64)
    v = ((2 * bits - 1) * tf[:, None]).sum(axis=0)
    return _pack_bits(v > 0)


_U1 = np.uint64(1)


def _pack_bits(bits_bool: np.ndarray) -> int:
    u = int((bits_bool.astype(np.uint64) << _BITPOS).sum(dtype=np.uint64))
    return u - (1 << 64) if u >= (1 << 63) else u


def simhash_batch(term_lists: list[np.ndarray], tf_lists: list[np.ndarray]) -> np.ndarray:
    """Vectorized simhash for a batch of docs -> int64 array."""
    n = len(term_lists)
    out = np.zeros(n, dtype=np.int64)
    if n == 0:
        return out
    flat_terms = np.concatenate([np.asarray(t, dtype=object) for t in term_lists]) if n else np.empty(0, dtype=object)
    flat_tfs = np.concatenate([np.asarray(t, dtype=np.int64) for t in tf_lists]) if n else np.empty(0, dtype=np.int64)
    counts = np.array([len(t) for t in term_lists], dtype=np.int64)
    if flat_terms.size == 0:
        return out
    uniq, inv = np.unique(flat_terms.astype(str), return_inverse=True)
    uh = np.array([term_hash64(t) for t in uniq], dtype=np.uint64)
    hs = uh[inv]
    signs = (((hs[:, None] >> _BITPOS[None, :]) & _U1).astype(np.int64) * 2 - 1)
    weighted = signs * flat_tfs[:, None]
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    nonempty = counts > 0
    sums = np.add.reduceat(weighted, starts[nonempty], axis=0)
    bits = sums > 0
    packed = (bits.astype(np.uint64) << _BITPOS[None, :]).sum(axis=1, dtype=np.uint64)
    out[nonempty] = packed.view(np.int64)
    return out


@F.pandas_udf(T.LongType())
def simhash_udf(terms: pd.Series, tfs: pd.Series) -> pd.Series:
    """Arrow-batched simhash over (array<string> terms, array<long> tfs)."""
    term_lists = [np.asarray(t if t is not None else [], dtype=object) for t in terms]
    tf_lists = [np.asarray(t if t is not None else [], dtype=np.int64) for t in tfs]
    return pd.Series(simhash_batch(term_lists, tf_lists))


def hamming_expr(a, b):
    """JVM-side hamming distance between two int64 simhash columns."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.bit_count(ca.bitwiseXOR(cb))


def neardup_score_expr(a, b):
    """1 - hamming/64, mirroring the reference's 1 - d/ndim similarity."""
    return F.lit(1.0) - hamming_expr(a, b).cast("double") / F.lit(64.0)
