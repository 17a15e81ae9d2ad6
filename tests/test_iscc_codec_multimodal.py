"""ISCC unit string codec (literal KATs + roundtrip) and multimodal
mapInPandas plumbing (schema, fan-out, determinism)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from iscc_search_spark.functions.iscc_codec import (
    code_to_simhash,
    decode_unit,
    encode_unit,
    simhash_to_code,
)
from iscc_search_spark.operators.multimodal import (
    extract_features,
    fake_decoder,
    sample_frames,
)


def test_header_literal():
    # CONTENT_TEXT_V0 64-bit: header nibbles (2,0,0,1) -> bytes 0x20 0x01
    code = encode_unit(b"\x00" * 8)
    assert code.startswith("ISCC:EAAQ")  # 0x20 0x01 0x00 -> 'EAAQ...'
    mt, st, ver, ln, body = decode_unit(code)
    assert (mt, st, ver, ln) == (2, 0, 0, 1)
    assert body == b"\x00" * 8
    # 2 header + 8 body bytes = 80 bits -> exactly 16 base32 chars
    assert len(code) == 5 + 16


def test_simhash_roundtrip():
    for v in [0, 1, -1, 2**63 - 1, -(2**63), 123456789123456789]:
        assert code_to_simhash(simhash_to_code(v)) == v


def test_rejects_wrong_type():
    code = encode_unit(b"\x00" * 8, maintype=3)
    with pytest.raises(ValueError):
        code_to_simhash(code)
    with pytest.raises(ValueError):
        encode_unit(b"\x00" * 8, maintype=9)


@pytest.fixture()
def media_df(spark):
    rows = [
        (1, b"img-bytes-1", "image", {"w": "8", "h": "8"}),
        (2, b"aud-bytes-2", "audio", {"sr": "16000"}),
        (3, b"vid-bytes-3", "video", {"fps": "24"}),
        (4, b"vid-bytes-4", "video", {}),
    ]
    return spark.createDataFrame(
        rows, "media_id long, media binary, media_type string, meta map<string,string>"
    )


def test_extract_features_schema_and_determinism(media_df):
    out = extract_features(media_df, feature_dim=16)
    rows = {r["media_id"]: r["feature"] for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert all(len(v) == 16 for v in rows.values())
    rows2 = {r["media_id"]: r["feature"] for r in extract_features(media_df, 16).collect()}
    assert rows == rows2  # deterministic fake decoder
    # matches a driver-side computation of the same pooling
    arr = fake_decoder(b"img-bytes-1", "image").astype(np.float64).ravel()
    blocks = np.array_split(arr, 8)
    want = np.concatenate([[b.mean() for b in blocks], [b.std() for b in blocks]])[:16]
    np.testing.assert_allclose(rows[1], want.astype(np.float32))


def test_sample_frames_fanout(media_df):
    out = sample_frames(media_df, n_frames=2).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    assert set(by_id) == {3, 4}  # only videos
    for rows in by_id.values():
        assert len(rows) == 2
        assert sorted(r["frame_idx"] for r in rows) == [0, 3]
        assert all(len(r["frame"]) == 8 * 8 * 3 for r in rows)


def test_unknown_media_type_raises(spark):
    df = spark.createDataFrame(
        [(9, b"x", "hologram", {})],
        "media_id long, media binary, media_type string, meta map<string,string>",
    )
    with pytest.raises(Exception, match="hologram|NotImplemented"):
        extract_features(df).collect()
