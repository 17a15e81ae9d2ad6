"""Codec roundtrip tests — literal vectors + randomized (seeded) arrays,
in the reference's literal-KAT style (tests/test_usearch_search.py:122-167)."""

import numpy as np
import pytest

from iscc_search_spark.functions import codec


def test_varbyte_literals():
    # 0 -> 0x00 ; 127 -> 0x7f ; 128 -> 0x80 0x01 ; 300 -> 0xac 0x02
    assert codec.varbyte_encode(np.array([0], np.uint64)) == b"\x00"
    assert codec.varbyte_encode(np.array([127], np.uint64)) == b"\x7f"
    assert codec.varbyte_encode(np.array([128], np.uint64)) == b"\x80\x01"
    assert codec.varbyte_encode(np.array([300], np.uint64)) == b"\xac\x02"
    assert codec.varbyte_encode(np.empty(0, np.uint64)) == b""


def test_varbyte_roundtrip_extremes():
    vals = np.array([0, 1, 127, 128, 2**32, 2**63, 2**64 - 1], dtype=np.uint64)
    assert np.array_equal(codec.varbyte_decode(codec.varbyte_encode(vals)), vals)


def test_docid_delta_roundtrip_random():
    rng = np.random.default_rng(7)
    for _ in range(50):
        n = int(rng.integers(0, 500))
        ids = np.unique(rng.integers(-(2**62), 2**62, size=n, dtype=np.int64))
        out = codec.decode_doc_ids(codec.encode_doc_ids(ids))
        assert np.array_equal(out, ids)


def test_docid_signed_extremes():
    ids = np.array([-(2**63), -1, 0, 1, 2**63 - 1], dtype=np.int64)
    assert np.array_equal(codec.decode_doc_ids(codec.encode_doc_ids(ids)), ids)


def test_docid_rejects_unsorted():
    with pytest.raises(ValueError):
        codec.encode_doc_ids(np.array([3, 2], dtype=np.int64))
    with pytest.raises(ValueError):
        codec.encode_doc_ids(np.array([2, 2], dtype=np.int64))


def test_compression_is_compact():
    # dense ascending ids -> ~1 byte per delta
    ids = np.arange(0, 10_000, dtype=np.int64) * 3
    buf = codec.encode_doc_ids(ids)
    assert len(buf) < 10_000 * 2


def test_for_pack_roundtrip_ragged_blocks():
    rng = np.random.default_rng(3)
    sizes = [0, 1, 128, 7, 0, 3, 128, 2, 64]
    starts, vals, pos = [], [], 0
    for n in sizes:
        starts.append(pos)
        if n:
            v = rng.integers(0, 1 << 63, size=n, dtype=np.int64).view(np.uint64)
            if n >= 3:
                v[0], v[1], v[2] = 0, np.uint64(2**64 - 1), np.uint64(1)
            vals.append(v)
            pos += n
    flat = np.concatenate(vals)
    buf, offs = codec.for_pack_batch(flat, np.array(starts))
    p = 0
    for b, n in enumerate(sizes):
        got = codec.for_unpack(buf[offs[b] : offs[b + 1]], n)
        assert np.array_equal(got, flat[p : p + n]), b
        p += n


def test_for_pack_zeros_and_empty():
    buf, offs = codec.for_pack_batch(np.zeros(5, np.uint64), np.array([0]))
    assert np.array_equal(codec.for_unpack(buf, 5), np.zeros(5, np.uint64))
    buf, offs = codec.for_pack_batch(np.empty(0, np.uint64), np.empty(0, np.int64))
    assert buf == b"" and list(offs) == [0]


def test_for_beats_varbyte_on_small_values():
    # tf-like data (1..11): FOR packs 4 bits/value vs varbyte's 8
    rng = np.random.default_rng(5)
    tfs = rng.integers(1, 12, size=12800).astype(np.uint64)
    starts = np.arange(0, 12800, 128)
    fb, _ = codec.for_pack_batch(tfs, starts)
    vb, _ = codec.varbyte_encode_batch(tfs)
    assert len(fb) < len(vb) * 0.6
