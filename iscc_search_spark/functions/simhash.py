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


def _hash_terms_flat(
    sub_terms: list[np.ndarray], total: int, use_cache: bool
) -> np.ndarray:
    """uint64 md5-hash per flat term.  The flat batch is FACTORIZED first
    so md5 runs once per unique string — cross-doc term overlap makes this
    the dominant win (measured 3x on the shingle path, where the
    process-lifetime cache is useless AND an unbounded memory leak:
    shingles are mostly batch-unique, so ``use_cache=False`` skips the
    dict entirely)."""
    flat = np.empty(total, dtype=object)
    pos = 0
    for tl in sub_terms:
        flat[pos : pos + len(tl)] = tl
        pos += len(tl)
    codes, uniq = pd.factorize(flat)
    if use_cache:
        hashed = np.fromiter(
            (term_hash64(t) for t in uniq), dtype=np.uint64, count=len(uniq)
        )
    else:
        md5 = hashlib.md5
        hashed = np.fromiter(
            (
                int.from_bytes(md5(t.encode("utf-8")).digest()[:8], "big")
                for t in uniq
            ),
            dtype=np.uint64,
            count=len(uniq),
        )
    return hashed[codes]


def simhash_batch(
    term_lists: list[np.ndarray],
    tf_lists: list[np.ndarray],
    chunk_docs: int = 256,
    use_cache: bool = True,
) -> np.ndarray:
    """Vectorized simhash for a batch of docs -> int64 array.

    Processes docs in sub-chunks so the (flat_tokens x 64) sign matrix stays
    ~10 MB regardless of Arrow batch size — an unchunked 10k-doc batch
    allocated ~1 GB per Python worker, which collapsed under 32 concurrent
    workers (measured: stage A 2.4x SLOWER at local[32] than local[8]).
    ``use_cache=False`` for feature sets that are mostly batch-unique
    (shingles): the global term cache would grow without bound.
    """
    n = len(term_lists)
    out = np.zeros(n, dtype=np.int64)
    for start in range(0, n, chunk_docs):
        end = min(start + chunk_docs, n)
        sub_terms = term_lists[start:end]
        sub_tfs = tf_lists[start:end]
        m = end - start
        counts = np.array([len(t) for t in sub_terms], dtype=np.int64)
        total = int(counts.sum())
        if total == 0:
            continue
        flat_hash = _hash_terms_flat(sub_terms, total, use_cache)
        flat_tfs = np.concatenate(
            [np.asarray(t, dtype=np.int64) for t in sub_tfs]
        ).astype(np.float32)
        uniq, inv = np.unique(flat_hash, return_inverse=True)
        bits = ((uniq[:, None] >> _BITPOS[None, :]) & _U1).astype(np.float32)
        # dense (docs x U) tf matrix -> one BLAS matmul:
        #   v_j = sum_i tf_i*(2*b_ij - 1) = 2*S_j - doc_len
        # float32 is exact here (all values integer < 2^24)
        T = np.zeros((m, len(uniq)), dtype=np.float32)
        row_idx = np.repeat(np.arange(m), counts)
        flat_key = row_idx * len(uniq) + inv
        if len(np.unique(flat_key)) == total:
            T[row_idx, inv] = flat_tfs  # fast path: per-doc-unique terms
        else:
            np.add.at(T, (row_idx, inv), flat_tfs)  # duplicates accumulate
        S = T @ bits  # (docs, 64)
        doc_len = np.array(
            [np.asarray(t, dtype=np.int64).sum() for t in sub_tfs],
            dtype=np.float32,
        )
        v = 2.0 * S - doc_len[:, None]
        packed = ((v > 0).astype(np.uint64) << _BITPOS[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        nonempty = counts > 0
        out[start:end][nonempty] = packed.view(np.int64)[nonempty]
    return out


def simhash_unweighted_batch(
    term_lists: list[np.ndarray], chunk_docs: int = 256
) -> np.ndarray:
    """simhash for per-doc DISTINCT feature sets (tf=1 each) -> int64.

    Identical result to simhash_batch with all-ones tfs, but skips the
    dense (docs x uniq) tf matrix + BLAS matmul: with tf=1 the bit sums
    are a direct np.add.reduceat over the flat hash-bit matrix.  Built for
    the shingle DATA unit, whose features are mostly batch-unique (the
    matrix path allocated ~m*U floats for a one-hot matrix)."""
    n = len(term_lists)
    out = np.zeros(n, dtype=np.int64)
    md5 = hashlib.md5
    for start in range(0, n, chunk_docs):
        end = min(start + chunk_docs, n)
        sub = term_lists[start:end]
        counts = np.array([len(t) for t in sub], dtype=np.int64)
        total = int(counts.sum())
        if total == 0:
            continue
        flat = np.fromiter(
            (
                int.from_bytes(md5(t.encode("utf-8")).digest()[:8], "big")
                for tl in sub
                for t in tl
            ),
            dtype=np.uint64,
            count=total,
        )
        # int16 halves the bit-matrix footprint; per-doc feature counts are
        # token-bounded (<< 32767) so the reduceat sums cannot overflow
        bits = ((flat[:, None] >> _BITPOS[None, :]) & _U1).astype(np.int16)
        nonempty = np.flatnonzero(counts > 0)
        offs = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        sums = np.add.reduceat(bits, offs[nonempty], axis=0).astype(np.int64)
        v = 2 * sums - counts[nonempty, None]
        packed = ((v > 0).astype(np.uint64) << _BITPOS[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        out[start:end][counts > 0] = packed.view(np.int64)
    return out


# --- 128-bit variant (granular segment simprints) ---------------------------
# The reference's simprint vectors are 128-bit binary hamming vectors
# (iscc_search/indexes/simprint/usearch_core.py:49 ndim=128 default, b1
# hamming metric).  The 128-bit simhash takes ALL 16 md5 bytes per term:
# the HIGH limb uses bytes [0:8) — bit-identical to the 64-bit simhash —
# and the LOW limb bytes [8:16).  Wider hashes concentrate the relative
# hamming distance of similar pairs (std ~ 1/sqrt(bits)), so absolute
# thresholds like max_hamming=12 become far more selective at equal recall
# for near-identical segments.


def term_hash128(term: str) -> tuple[int, int]:
    """(hi, lo) uint64 limbs of md5(term); hi == term_hash64(term)."""
    d = hashlib.md5(term.encode("utf-8")).digest()
    return int.from_bytes(d[:8], "big"), int.from_bytes(d[8:16], "big")


def simhash128_from_tf(
    terms: list[str] | np.ndarray, tfs: np.ndarray
) -> tuple[int, int]:
    """Single-doc 128-bit simhash -> (hi, lo) signed int64 limbs (oracle
    path); hi is bit-identical to simhash_from_tf."""
    if len(terms) == 0:
        return 0, 0
    hs = np.array([term_hash128(t) for t in terms], dtype=np.uint64)
    tf = np.asarray(tfs, dtype=np.int64)
    out = []
    for limb in range(2):
        bits = ((hs[:, limb][:, None] >> _BITPOS[None, :]) & _U1).astype(np.int64)
        v = ((2 * bits - 1) * tf[:, None]).sum(axis=0)
        out.append(_pack_bits(v > 0))
    return out[0], out[1]


_TERM128_CACHE: dict[str, tuple[int, int]] = {}
# bounded: bigram vocab is Zipf but open-ended.  2^18 entries ≈ 40-75 MB
# of dict per Python worker (key str + 2-int tuple ≈ 160-290 B each); with
# tens of Arrow workers per host that stays under ~2 GB host-wide, where
# the old 2^21 cap allowed multi-GB per worker before clearing.  The clear
# happens BEFORE the insert that would exceed the cap (inside
# _hash_terms_flat128), so the dict never grows past the bound.
_TERM128_CACHE_MAX = 1 << 18


def _hash_terms_flat128(sub_terms: list[np.ndarray], total: int) -> np.ndarray:
    """(total, 2) uint64 md5 limbs per flat term — ONE md5 per unique
    string (factorized batch), both limbs from the same digest, with a
    bounded process-lifetime cache (segment features are word bigrams
    that repeat heavily across documents; the cache resets rather than
    grows past _TERM128_CACHE_MAX)."""
    flat = np.empty(total, dtype=object)
    pos = 0
    for tl in sub_terms:
        flat[pos : pos + len(tl)] = tl
        pos += len(tl)
    codes, uniq = pd.factorize(flat)
    md5 = hashlib.md5
    cache = _TERM128_CACHE
    cap = _TERM128_CACHE_MAX
    hashed = np.empty((len(uniq), 2), dtype=np.uint64)
    for i, t in enumerate(uniq):
        hl = cache.get(t)
        if hl is None:
            d = md5(t.encode("utf-8")).digest()
            hl = (int.from_bytes(d[:8], "big"), int.from_bytes(d[8:16], "big"))
            if len(cache) >= cap:
                cache.clear()
            cache[t] = hl
        hashed[i, 0] = hl[0]
        hashed[i, 1] = hl[1]
    return hashed[codes]


def simhash128_batch(
    term_lists: list[np.ndarray],
    tf_lists: list[np.ndarray],
    chunk_docs: int = 256,
) -> np.ndarray:
    """Vectorized 128-bit simhash for a batch of docs -> (n, 2) int64
    array of (hi, lo) limbs; hi is bit-identical to simhash_batch.  Same
    chunked dense-matmul kernel (the bit matrix is 128 wide instead of
    64, still ~20 MB per chunk)."""
    n = len(term_lists)
    out = np.zeros((n, 2), dtype=np.int64)
    for start in range(0, n, chunk_docs):
        end = min(start + chunk_docs, n)
        sub_terms = term_lists[start:end]
        sub_tfs = tf_lists[start:end]
        m = end - start
        counts = np.array([len(t) for t in sub_terms], dtype=np.int64)
        total = int(counts.sum())
        if total == 0:
            continue
        flat_hash = _hash_terms_flat128(sub_terms, total)
        flat_tfs = np.concatenate(
            [np.asarray(t, dtype=np.int64) for t in sub_tfs]
        ).astype(np.float32)
        # unique over the (hi, lo) pair — view the 2-limb rows as void rows
        uniq, inv = np.unique(
            np.ascontiguousarray(flat_hash).view([("hi", "u8"), ("lo", "u8")]),
            return_inverse=True,
        )
        inv = inv.ravel()
        bits = np.concatenate(
            [
                ((uniq["hi"][:, None] >> _BITPOS[None, :]) & _U1),
                ((uniq["lo"][:, None] >> _BITPOS[None, :]) & _U1),
            ],
            axis=1,
        ).astype(np.float32)
        T_ = np.zeros((m, len(uniq)), dtype=np.float32)
        row_idx = np.repeat(np.arange(m), counts)
        flat_key = row_idx * len(uniq) + inv
        if len(np.unique(flat_key)) == total:
            T_[row_idx, inv] = flat_tfs
        else:
            np.add.at(T_, (row_idx, inv), flat_tfs)
        S = T_ @ bits  # (docs, 128)
        doc_len = np.array(
            [np.asarray(t, dtype=np.int64).sum() for t in sub_tfs],
            dtype=np.float32,
        )
        v = 2.0 * S - doc_len[:, None]
        pos_bits = v > 0
        for limb in range(2):
            packed = (
                pos_bits[:, limb * 64 : (limb + 1) * 64].astype(np.uint64)
                << _BITPOS[None, :]
            ).sum(axis=1, dtype=np.uint64)
            nonempty = counts > 0
            out[start:end, limb][nonempty] = packed.view(np.int64)[nonempty]
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


def hamming128_expr(a_hi, a_lo, b_hi, b_lo):
    """JVM-side hamming distance between two (hi, lo) 128-bit columns."""
    return hamming_expr(a_hi, b_hi) + hamming_expr(a_lo, b_lo)


def neardup_score128_expr(a_hi, a_lo, b_hi, b_lo):
    """1 - hamming/128 over (hi, lo) limb pairs (ndim=128, the reference
    simprint default)."""
    return F.lit(1.0) - hamming128_expr(a_hi, a_lo, b_hi, b_lo).cast(
        "double"
    ) / F.lit(128.0)
