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


def test_iscc_code_compose_decompose_roundtrip():
    from iscc_search_spark.functions.iscc_codec import (
        MT_CONTENT,
        MT_DATA,
        MT_INSTANCE,
        MT_META,
        compose_iscc,
        decompose_iscc,
    )

    units = [
        (MT_CONTENT, 0, (0x1234567890ABCDEF).to_bytes(8, "big")),
        (MT_DATA, 0, (0xDEADBEEF00112233).to_bytes(8, "big")),
        (MT_INSTANCE, 0, (0xFFFFFFFFFFFFFFFF).to_bytes(8, "big")),
    ]
    code = compose_iscc(units)
    assert code.startswith("ISCC:")
    out = decompose_iscc(code)
    assert [(mt, body) for mt, _, _, body in out] == [
        (mt, body) for mt, _, body in units
    ]
    # with META, and without CONTENT (DATA+INSTANCE minimum)
    units4 = [(MT_META, 0, b"\x01" * 8)] + units
    out4 = decompose_iscc(compose_iscc(units4))
    assert [mt for mt, _, _, _ in out4] == [MT_META, MT_CONTENT, MT_DATA, MT_INSTANCE]
    mini = units[1:]
    outm = decompose_iscc(compose_iscc(mini))
    assert [mt for mt, _, _, _ in outm] == [MT_DATA, MT_INSTANCE]


def test_iscc_code_requires_data_instance():
    import pytest as _pytest

    from iscc_search_spark.functions.iscc_codec import MT_CONTENT, compose_iscc

    with _pytest.raises(ValueError, match="DATA and INSTANCE"):
        compose_iscc([(MT_CONTENT, 0, b"\x00" * 8)])


def test_multiunit_search_python_oracle(spark):
    """search_assets_multiunit vs a brute-force Python scorer implementing
    the reference's aggregation (usearch/index.py:735-881) directly."""
    import hashlib

    from collections import Counter

    from iscc_search_spark.functions.simhash import simhash_from_tf
    from iscc_search_spark.functions.textnorm import tokenize_py
    from iscc_search_spark.operators.multiunit import search_assets_multiunit

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = docs.select("doc_id", "text").collect()

    def units_of(text):
        toks = tokenize_py(text)
        c = Counter(toks)
        ts = sorted(c)
        content = simhash_from_tf(ts, [c[t] for t in ts]) if ts else 0
        sh3 = sorted({" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)})
        data = simhash_from_tf(sh3, [1] * len(sh3)) if sh3 else 0
        inst = int.from_bytes(
            hashlib.md5(text.encode()).digest()[:8], "big", signed=True
        )
        return content, data, inst

    per_doc = {r["doc_id"]: units_of(r["text"]) for r in rows}
    QID = 7
    qc, qd, qi = per_doc[QID]

    def ham(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    want = []
    for did, (c, d, i) in per_doc.items():
        if did == QID:
            continue
        scores = [1 - ham(c, qc) / 64.0, 1 - ham(d, qd) / 64.0, 1.0 if i == qi else 0.0]
        conf = [s for s in scores if s >= 0.75]
        if not conf:
            continue
        total = sum(s**4 for s in conf) / sum(conf)
        want.append((did, total, len(conf)))
    want.sort(key=lambda x: (-x[1], x[0]))
    want = want[:10]

    got = [
        (r["doc_id"], r["score"], r["n_units"])
        for r in search_assets_multiunit(docs, QID, k=10).orderBy("rank").collect()
    ]
    assert [(d, n) for d, _, n in want] == [(d, n) for d, _, n in got]
    for (_, sw, _), (_, sg, _) in zip(want, got):
        assert abs(sw - sg) < 1e-12
    assert want, "query doc should have confident matches"


def test_nphd_mixed_lengths_python_oracle(spark):
    """NPHD over a mixed 64/128-bit unit table vs brute-force Python:
    distance = hamming over the common prefix / prefix bits."""
    from iscc_search_spark.operators.multiunit import mixed_length_units, nphd_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    units = mixed_length_units(docs)
    rows = {r["doc_id"]: (r["hi"], r["lo"], r["bits"]) for r in units.collect()}
    # fixture shape: odd ids 64-bit (lo null), even ids 128-bit
    assert all((b == 64) == (lo is None) for _, lo, b in rows.values())

    def ham64(a, b):
        return bin((a ^ b) & (2**64 - 1)).count("1")

    for qid in (7, 8):  # one 64-bit query, one 128-bit query
        qh, ql, qb = rows[qid]
        want = []
        for did, (h, lo, b) in rows.items():
            if did == qid:
                continue
            mb = min(b, qb)
            if mb <= 64:
                d = ham64(h, qh) / 64.0
            else:
                d = (ham64(h, qh) + ham64(lo, ql)) / 128.0
            want.append((did, d))
        want.sort(key=lambda x: (x[1], x[0]))
        got = [
            (r["doc_id"], r["nphd"])
            for r in nphd_topk(units, qid, k=10).orderBy("rank").collect()
        ]
        assert got == want[:10], qid


def test_wide_unit_codes_roundtrip():
    """F3: 128/192/256-bit bodies through the string codec (WIDE units,
    reference models.py:225-316 width range)."""
    from iscc_search_spark.functions.iscc_codec import code_to_limbs, limbs_to_code

    cases = [
        [0xF123456789ABCDEF - (1 << 64)],                       # 64 (negative limb)
        [1, -2],                                                 # 128
        [-(1 << 62), 7, 0],                                      # 192
        [2**63 - 1, -(2**63), 0, -1],                            # 256
    ]
    for limbs in cases:
        code = limbs_to_code(limbs)
        assert code.startswith("ISCC:")
        mt, st, ver, got, bits = code_to_limbs(code)
        assert (mt, st, ver) == (2, 0, 0)
        assert got == limbs and bits == 64 * len(limbs)
    with pytest.raises(ValueError):
        limbs_to_code([])
    with pytest.raises(ValueError):
        limbs_to_code([0] * 5)


def test_wide_code_udf_matches_python(spark):
    from pyspark.sql import functions as F

    from iscc_search_spark.functions.iscc_codec import (
        code_to_limbs,
        wide_code_expr,
    )

    rows = [(1, 10, None, None, None, 64), (2, 11, -5, None, None, 128),
            (3, 12, 13, 14, None, 192), (4, -1, -(2**63), 2**63 - 1, -4, 256)]
    df = spark.createDataFrame(
        rows, "doc_id long, u0 long, u1 long, u2 long, u3 long, bits int"
    )
    got = {
        r["doc_id"]: r["code"]
        for r in df.select(
            "doc_id",
            wide_code_expr("u0", "u1", "u2", "u3", "bits").alias("code"),
        ).collect()
    }
    for doc_id, u0, u1, u2, u3, bits in rows:
        limbs = [v for v in (u0, u1, u2, u3) if v is not None][: bits // 64]
        _, _, _, back, b = code_to_limbs(got[doc_id])
        assert back == limbs and b == bits  # incl. full-range int64 limbs


def test_iscc_id_realm_roundtrip_and_validation():
    """P4: realm-scoped ISCC-IDs — encode/decode round-trip and the
    reference's validate checks (indexes/common.py:223-262)."""
    from iscc_search_spark.functions.iscc_codec import (
        encode_unit,
        iscc_id_decode,
        iscc_id_encode,
        validate_iscc_id,
    )

    for realm in (0, 1):
        for body in (0, -1, 2**63 - 1, -(2**63)):
            code = iscc_id_encode(body, realm)
            assert iscc_id_decode(code) == (realm, body)
            validate_iscc_id(code, expected_realm=realm)
            with pytest.raises(ValueError):
                validate_iscc_id(code, expected_realm=1 - realm)
    with pytest.raises(ValueError):
        iscc_id_decode("not-an-iscc")
    with pytest.raises(ValueError):
        iscc_id_decode("ISCC:!!!!")
    with pytest.raises(ValueError):
        iscc_id_decode(encode_unit(b"\x00" * 8))  # CONTENT unit, not an ID
    with pytest.raises(ValueError):
        iscc_id_encode(1, realm=2)
