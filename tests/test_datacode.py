"""DATA_V0 CDC+minhash: parity with an independent per-byte reference
implementation, content-defined re-synchronization, edit locality, and the
Spark UDF boundary."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from iscc_search_spark.functions import datacode as dc


def _ref_boundaries(data: bytes, avg_bits=dc.AVG_BITS, min_size=dc.MIN_SIZE,
                    max_size=dc.MAX_SIZE) -> list[int]:
    """Independent oracle: per-byte rolling gear recurrence
    h = (h << 1) + gear[b] mod 2^64 with the same min/max greedy."""
    mask = (1 << avg_bits) - 1
    out, start = [], 0
    h = 0
    i = 0
    n = len(data)
    while i < n:
        h = ((h << 1) + int(dc._GEAR[data[i]])) & (2**64 - 1)
        size = i + 1 - start
        if (size >= min_size and (h & mask) == 0) or size >= max_size:
            out.append(i + 1)
            start = i + 1
            h = h  # gear window carries across cuts (same as vectorized)
        i += 1
    if start < n:
        out.append(n)
    return out


def _rand_bytes(n: int, seed: int) -> bytes:
    return np.random.default_rng(seed).integers(0, 256, size=n, dtype=np.uint8).tobytes()


def test_boundaries_match_reference_recurrence():
    for seed in (1, 2, 3):
        data = _rand_bytes(50_000, seed)
        assert dc.cdc_boundaries(data) == _ref_boundaries(data)


def test_boundaries_resynchronize_after_insertion():
    base = _rand_bytes(60_000, 7)
    shifted = b"XYZPREFIX" + base
    b0 = set(dc.cdc_boundaries(base))
    b1 = {x - 9 for x in dc.cdc_boundaries(shifted)}
    # content-defined: beyond the first chunk the cut POINTS realign
    late0 = {x for x in b0 if x > 20_000}
    assert late0 and len(late0 & b1) / len(late0) > 0.9


def test_data_code_edit_locality():
    base = _rand_bytes(80_000, 11)
    edited = base[:40_000] + b"!" + base[40_000:]
    unrelated = _rand_bytes(80_000, 99)
    c0, c1, c2 = (dc.data_code_py(x) for x in (base, edited, unrelated))
    assert dc.data_similarity(c0, c1) > 0.8  # one-byte insert: most chunks survive
    assert dc.data_similarity(c0, c2) < 0.75  # unrelated: ~0.5 expected
    assert dc.data_code_py(base) == c0  # deterministic


def test_degenerate_inputs():
    assert dc.data_code_py(b"") == 0
    assert dc.data_code_py(None) == 0
    tiny = b"abc"
    assert dc.cdc_boundaries(tiny) == [3]
    assert isinstance(dc.data_code_py(tiny), int)
    const = b"\x00" * 10_000  # all-equal bytes must respect max_size
    bounds = dc.cdc_boundaries(const)
    sizes = np.diff([0] + bounds)
    assert sizes.max() <= dc.MAX_SIZE and bounds[-1] == 10_000


def test_udf_matches_python(spark, pages_df):
    from pyspark.sql import functions as F

    sample = pages_df.orderBy("url").limit(20)
    got = {
        r["url"]: r["dc"]
        for r in sample.select("url", dc.data_code_udf("html").alias("dc")).collect()
    }
    want = {
        r["url"]: dc.data_code_py(bytes(r["html"]))
        for r in sample.select("url", "html").collect()
    }
    assert got == want
    assert len(set(got.values())) > 10  # discriminative across docs
