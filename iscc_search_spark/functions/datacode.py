"""DATA_V0 over raw bytes: content-defined chunking (CDC) + minhash.

The reference's DATA unit (via the public iscc-core spec, gen_data_code_v0)
is a 64-bit similarity hash over the raw byte stream: the stream is cut at
content-defined boundaries (gear rolling hash — boundaries move WITH the
content, so inserting bytes early shifts chunk starts but re-synchronizes
within one chunk), each chunk is feature-hashed, and a minhash over the
chunk-feature set is compressed to one bit per permutation.  This module
implements those published semantics from scratch:

- gear table: 256 uint64 drawn from a fixed seeded PRNG (our own table —
  any fixed random table works; the algorithm, not the constants, is the
  published contract);
- rolling hash h_t = sum_{j>=0} gear[b_{t-j}] << j (the classic gear
  recurrence h = (h << 1) + gear[b], whose low k bits depend on the last k
  bytes only) — computed VECTORIZED as 64 shifted whole-array adds, never a
  per-byte Python loop;
- a boundary closes a chunk at byte t when (h_t & mask) == 0, subject to
  min/max chunk sizes (greedy over the sparse candidate set);
- chunk feature = first 8 bytes of blake2b(chunk) as uint64;
- minhash: 64 permutations pi_k(f) = (a_k * f32 + b_k) mod (2^31 - 1) over
  the 32-bit folds of the features; DATA code bit k = lowest bit of
  min(pi_k) (the iscc-core minhash compression rule).

Used as the byte-level DATA unit for inputs that carry raw bytes (the
pages corpus ``html`` column); the token-shingle simhash stand-in remains
for text-only tables where the DuckDB oracle must reproduce the value
(operators/multiunit.py documents the split).

No SQL oracle exists for CDC (the boundary recurrence is inherently
sequential), so correctness is pytest-gated against an independent
pure-Python reference implementation plus property tests
(shift-resynchronization, edit locality) — the driver records the
queries() entry as rows-only.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iscc_search_spark.functions.hashing import MERSENNE_31, minhash_params

# fixed gear table — OUR constants (seeded numpy PRNG), not copied anywhere
_GEAR = np.random.default_rng(0x15CC).integers(
    0, 2**63 - 1, size=256, dtype=np.int64
).astype(np.uint64)

AVG_BITS = 11           # ~2 KiB average chunks
MIN_SIZE = 256
MAX_SIZE = 16384
N_PERM = 64

_A, _B = minhash_params(N_PERM, seed=0x15CC)
_A64 = np.array(_A, dtype=np.int64)
_B64 = np.array(_B, dtype=np.int64)


def _gear_hashes(data: bytes) -> np.ndarray:
    """h_t for every byte position t (uint64), vectorized: 64 shifted adds
    (bit j of the window sum uses the gear value of the byte j back)."""
    b = np.frombuffer(data, dtype=np.uint8)
    g = _GEAR[b]
    h = np.zeros(len(b), dtype=np.uint64)
    for j in range(64):
        if j >= len(b):
            break
        h[j:] += g[: len(b) - j] << np.uint64(j)
    return h


def cdc_boundaries(
    data: bytes,
    avg_bits: int = AVG_BITS,
    min_size: int = MIN_SIZE,
    max_size: int = MAX_SIZE,
) -> list[int]:
    """Chunk END offsets (exclusive, ascending, last == len(data)).

    Candidates are the sparse (h & mask)==0 positions (vectorized); the
    min/max-size greedy walks only candidates + forced cuts (~len/2^avg_bits
    iterations of Python, not per-byte)."""
    n = len(data)
    if n == 0:
        return []
    mask = np.uint64((1 << avg_bits) - 1)
    h = _gear_hashes(data)
    cands = np.flatnonzero((h & mask) == 0) + 1  # boundary AFTER byte t
    out: list[int] = []
    start = 0
    i = 0
    while start < n:
        limit = min(start + max_size, n)
        cut = limit
        while i < len(cands) and cands[i] <= limit:
            if cands[i] - start >= min_size:
                cut = int(cands[i])
                i += 1
                break
            i += 1
        out.append(cut)
        start = cut
        while i < len(cands) and cands[i] <= start:
            i += 1
    if out[-1] != n:
        out[-1] = n  # final partial chunk always closes at EOF
    return out


def chunk_features(data: bytes, bounds: list[int]) -> np.ndarray:
    """uint64 feature per chunk: first 8 bytes of blake2b(chunk)."""
    out = np.empty(len(bounds), dtype=np.uint64)
    start = 0
    for i, end in enumerate(bounds):
        d = hashlib.blake2b(data[start:end], digest_size=8).digest()
        out[i] = int.from_bytes(d, "big")
        start = end
    return out


def minhash_bits(features: np.ndarray) -> int:
    """64-bit code: bit k (MSB first) = lowest bit of min over features of
    pi_k(f) — the iscc-core minhash compression rule.  Empty input -> 0."""
    if len(features) == 0:
        return 0
    f32 = (features & np.uint64(0xFFFFFFFF)).astype(np.int64) % MERSENNE_31
    # (n_perm, n_feat): products < 2^62 — overflow-safe int64
    m = (f32[None, :] * _A64[:, None] + _B64[:, None]) % MERSENNE_31
    bits = (m.min(axis=1) & 1).astype(np.uint64)
    u = int((bits << np.arange(63, -1, -1, dtype=np.uint64)).sum(dtype=np.uint64))
    return u - (1 << 64) if u >= (1 << 63) else u


def data_code_py(data: bytes | None) -> int:
    """Raw bytes -> 64-bit DATA code (signed int64 view)."""
    if not data:
        return 0
    return minhash_bits(chunk_features(data, cdc_boundaries(data)))


@F.pandas_udf(T.LongType())
def data_code_udf(data: pd.Series) -> pd.Series:
    """Arrow-batched DATA code over a binary column."""
    return pd.Series(
        [data_code_py(bytes(v) if v is not None else None) for v in data],
        dtype="int64",
    )


def data_similarity(code_a: int, code_b: int) -> float:
    """1 - hamming/64 — the unit similarity used by multi-unit search."""
    return 1.0 - bin((code_a ^ code_b) & (2**64 - 1)).count("1") / 64.0
