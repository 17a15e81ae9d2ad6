"""Posting-list codec: docID delta + varbyte, numpy-vectorized.

The compressed-posting analogue of the reference's LMDB dupsort pages
(sorted duplicate doc-id runs per term key,
iscc_search/indexes/lmdb/index.py:395-422): ascending doc_ids are
delta-encoded (first value zigzag'd — doc_ids are signed 64-bit blake2b
prefixes) and LEB128-varbyte packed; term frequencies are varbyte packed
in parallel.

Both encode and decode are numpy-vectorized: the per-value work is a loop
over *byte positions* (≤10 iterations of whole-array ops), never over
values — the Arrow-batch discipline mandated by the input_hint ("no
per-row Python").
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_MAX_VARBYTE_LEN = 10


def zigzag(v: np.ndarray) -> np.ndarray:
    """Signed int64 -> uint64 zigzag (small magnitude -> small code)."""
    v = v.astype(np.int64, copy=False)
    return ((v << 1) ^ (v >> 63)).view(np.uint64)


def unzigzag(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64, copy=False)
    return ((u >> _U64(1)) ^ (_U64(0) - (u & _U64(1)))).view(np.int64)


def varbyte_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte length per value (vectorized)."""
    v = values.astype(np.uint64, copy=True)
    bits = np.zeros(len(v), dtype=np.int64)
    nonzero = v != 0
    while nonzero.any():
        bits[nonzero] += 1
        v >>= _U64(7)
        nonzero = v != 0
    return np.maximum(bits, 1)


def varbyte_encode_batch(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode a uint64 array; returns (buffer, per-value byte offsets of
    length n+1) so callers can slice out contiguous sub-ranges — the
    whole-group encode path (one vectorized pass for ~10^5 blocks instead
    of one numpy call per block)."""
    n = len(values)
    if n == 0:
        return b"", np.zeros(1, dtype=np.int64)
    nbytes = varbyte_lengths(values)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(nbytes, out=offsets[1:])
    out = np.zeros(int(offsets[-1]), dtype=np.uint8)
    pos = offsets[:-1]
    rem = values.astype(np.uint64, copy=True)
    for k in range(_MAX_VARBYTE_LEN):
        mask = nbytes > k
        if not mask.any():
            break
        byte = (rem[mask] & _U64(0x7F)).astype(np.uint8)
        more = (nbytes[mask] > k + 1).astype(np.uint8) << 7
        out[pos[mask] + k] = byte | more
        rem[mask] >>= _U64(7)
    return out.tobytes(), offsets


def varbyte_encode(values: np.ndarray) -> bytes:
    """LEB128 encode a uint64 array (vectorized over byte positions)."""
    v = values.astype(np.uint64, copy=True)
    n = len(v)
    if n == 0:
        return b""
    # bytes needed per value: ceil(bits/7), min 1
    bits = np.zeros(n, dtype=np.int64)
    tmp = v.copy()
    nonzero = tmp != 0
    while nonzero.any():
        bits[nonzero] += 1
        tmp >>= _U64(7)
        nonzero = tmp != 0
    nbytes = np.maximum(bits, 1)
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    pos = np.concatenate([[0], np.cumsum(nbytes)[:-1]])
    rem = v.copy()
    for k in range(_MAX_VARBYTE_LEN):
        mask = nbytes > k
        if not mask.any():
            break
        byte = (rem[mask] & _U64(0x7F)).astype(np.uint8)
        more = (nbytes[mask] > k + 1).astype(np.uint8) << 7
        out[pos[mask] + k] = byte | more
        rem[mask] >>= _U64(7)
    return out.tobytes()


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes to uint64 (vectorized over byte positions)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.concatenate([[0], ends[:-1] + 1])
    n = len(ends)
    out = np.zeros(n, dtype=np.uint64)
    lengths = ends - starts + 1
    for k in range(int(lengths.max())):
        mask = lengths > k
        out[mask] |= (b[starts[mask] + k] & 0x7F).astype(np.uint64) << _U64(7 * k)
    return out


_SIGN_BIT = np.uint64(1 << 63)


def encode_doc_ids(doc_ids: np.ndarray) -> bytes:
    """Strictly-ascending signed int64 doc_ids -> first value + uint64 deltas.

    The sign bit is flipped first (order-preserving int64 -> uint64 map) so
    deltas are computed in uint64 space: blake2b doc_ids span nearly the
    whole signed range, and adjacent gaps can exceed 2^63 — int64 delta
    arithmetic would overflow.
    """
    d = np.asarray(doc_ids, dtype=np.int64)
    if len(d) == 0:
        return b""
    u = d.view(np.uint64) ^ _SIGN_BIT
    codes = np.empty(len(u), dtype=np.uint64)
    codes[0] = u[0]
    if len(u) > 1:
        if (u[1:] <= u[:-1]).any():
            raise ValueError("doc_ids must be strictly ascending")
        codes[1:] = u[1:] - u[:-1]
    return varbyte_encode(codes)


def decode_doc_ids(buf: bytes) -> np.ndarray:
    codes = varbyte_decode(buf)
    if len(codes) == 0:
        return np.empty(0, dtype=np.int64)
    u = np.cumsum(codes, dtype=np.uint64)
    return (u ^ _SIGN_BIT).view(np.int64)


def doc_id_delta_codes(doc_ids: np.ndarray, block_starts: np.ndarray) -> np.ndarray:
    """uint64 delta codes for a CONCATENATION of ascending blocks: each
    block restarts with its raw (sign-flipped) first value; within-block
    positions carry deltas.  Feed to varbyte_encode_batch and slice per
    block — the vectorized whole-group encode path."""
    d = np.asarray(doc_ids, dtype=np.int64)
    u = d.view(np.uint64) ^ _SIGN_BIT
    codes = np.empty(len(u), dtype=np.uint64)
    if len(u):
        codes[1:] = u[1:] - u[:-1]
        codes[block_starts] = u[block_starts]
    return codes


def encode_tfs(tfs: np.ndarray) -> bytes:
    return varbyte_encode(np.asarray(tfs, dtype=np.int64).view(np.uint64))


def decode_tfs(buf: bytes) -> np.ndarray:
    return varbyte_decode(buf).view(np.int64)
