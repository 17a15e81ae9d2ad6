"""Granular simprint search vs a python brute-force oracle."""

import pytest
from pyspark.sql import functions as F

from iscc_search_spark.operators.simprints import (
    granular_topk,
    segment_simhashes_py,
    simprints_table,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def query_text(docs):
    """64 tokens lifted from the longest corpus doc, two substituted in
    the second window — one exact-match segment plus one near-match (the
    bigram-shingle features make unrelated windows ~64/128 hamming away,
    so a vocabulary-soup query matches nothing; real queries are
    excerpts)."""
    from iscc_search_spark.functions.textnorm import tokenize_py

    row = docs.selectExpr("text", "length(text) AS n").orderBy(
        F.desc("n"), "doc_id"
    ).first()
    toks = tokenize_py(row["text"])[:64]
    assert len(toks) == 64
    toks[37] = "qqswap"
    toks[55] = "qqswap2"
    return " ".join(toks)


def test_simprints_table_matches_python(spark, docs):
    rows = docs.select("doc_id", "text").collect()
    want = {
        (r["doc_id"], s, n, o, z): (hi, lo)
        for r in rows
        for s, n, o, z, hi, lo in segment_simhashes_py(r["text"])
    }
    got = {
        (r["doc_id"], r["seg_idx"], r["n_tokens"], r["offset"], r["size"]): (
            r["simhash"],
            r["sh_lo"],
        )
        for r in simprints_table(docs).collect()
    }
    assert got == want


def test_segment_byte_spans_independent_oracle():
    """(offset, size) must be the byte span of the segment's tokens in the
    canonical (NFC + lowercase) text — verified with an independent
    cursor-walk span computation, including non-ASCII multibyte text."""
    import unicodedata

    from iscc_search_spark.functions.textnorm import tokenize_py

    texts = [
        "Hello, World! foo--bar baz " + "tok " * 80,
        "  leading sepérators café über " + "wörter " * 40,
        "",
        "punct!!!",
    ]
    for text in texts:
        norm = unicodedata.normalize("NFC", text).lower()
        toks = tokenize_py(text)
        # independent span walk: find each token left-to-right by cursor
        # tokens are maximal runs in order, so the first occurrence at or
        # after the cursor (which sits in the preceding separator) is exact
        spans, cur = [], 0
        for t in toks:
            i = norm.index(t, cur)
            b0 = len(norm[:i].encode("utf-8"))
            b1 = len(norm[: i + len(t)].encode("utf-8"))
            spans.append((b0, b1))
            cur = i + len(t)
        segs = segment_simhashes_py(text, seg_tokens=32)
        assert len(segs) == (len(toks) + 31) // 32 if toks else not segs
        for s, n, o, z, _, _ in segs:
            first = spans[s * 32]
            last = spans[s * 32 + n - 1]
            assert o == first[0] and z == last[1] - first[0], (text[:20], s)
            # span slices back to bytes containing exactly those tokens
            blob = norm.encode("utf-8")[o : o + z].decode("utf-8")
            assert tokenize_py(blob) == toks[s * 32 : s * 32 + n]


MAXH = 24  # 128-bit hamming threshold for the brute-force parity test


def test_granular_topk_matches_bruteforce(spark, docs, query_text):
    rows = docs.select("doc_id", "text").collect()
    qsegs = segment_simhashes_py(query_text)
    n_q = len(qsegs)

    def ham(a_hi, a_lo, b_hi, b_lo):
        m = 2**64 - 1
        return bin((a_hi ^ b_hi) & m).count("1") + bin((a_lo ^ b_lo) & m).count("1")

    scores = {}
    for r in rows:
        best: dict[int, float] = {}
        for _, _, _, _, dhi, dlo in segment_simhashes_py(r["text"]):
            for qi, _, _, _, qhi, qlo in qsegs:
                h = ham(dhi, dlo, qhi, qlo)
                if h <= MAXH:
                    sim = 1.0 - h / 128.0
                    if sim > best.get(qi, -1.0):
                        best[qi] = sim
        if best:
            scores[r["doc_id"]] = (sum(best.values()) / n_q, len(best))
    want = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[:10]

    got = [
        (r["doc_id"], (r["score"], r["n_matched_segs"]))
        for r in granular_topk(docs, query_text, k=10, max_hamming=MAXH)
        .orderBy("rank")
        .collect()
    ]
    assert [(d, s) for d, (s, _) in want] == [(d, s) for d, (s, _) in got]
    assert [n for _, (_, n) in want] == [n for _, (_, n) in got]
    assert want, "query should match segments in the corpus"


def test_granular_empty_query(spark, docs):
    assert granular_topk(docs, "???", k=5).count() == 0


def test_band_key128_expr_mirrors_python(spark):
    """The JVM band-key expressions and the Python query-side keys must
    agree bit-for-bit for every (shift, width) shape: within-limb,
    limb-spanning, and the degenerate >=64-bit windows (signed wrap) —
    plus multi-band combo keys whose total width reaches 64 bits."""
    import random

    from pyspark.sql import functions as F

    from iscc_search_spark.operators.simprints import (
        _combo_key_expr,
        _combo_key_py,
        band_key128_expr,
        band_key128_py,
        band_widths,
    )

    rng = random.Random(7)
    rows = [
        (rng.getrandbits(64) - (1 << 63), rng.getrandbits(64) - (1 << 63))
        for _ in range(64)
    ] + [(0, 0), (-1, -1), (1 << 62, -(1 << 62))]
    df = spark.createDataFrame(rows, "hi long, lo long")

    shapes = [(0, 10), (58, 10), (60, 9), (63, 2), (64, 10), (120, 8),
              (0, 64), (32, 64), (64, 64), (0, 128), (5, 100)]
    cols = [
        band_key128_expr("hi", "lo", s, w).alias(f"k{i}")
        for i, (s, w) in enumerate(shapes)
    ]
    got = df.select("hi", "lo", *cols).collect()
    for r in got:
        for i, (s, w) in enumerate(shapes):
            assert r[f"k{i}"] == band_key128_py(r["hi"], r["lo"], s, w), (s, w)

    # combo keys: 13 bands over 128 bits, combos incl. a 7-subset whose
    # concatenated width exceeds 63 bits (the signed-wrap regime)
    widths = band_widths(13, 128)
    combos = [(0,), (12,), (0, 1), (3, 7, 11), tuple(range(7))]
    ccols = [
        _combo_key_expr("hi", "lo", widths, idxs).alias(f"c{i}")
        for i, idxs in enumerate(combos)
    ]
    got = df.select("hi", "lo", *ccols).collect()
    for r in got:
        for i, idxs in enumerate(combos):
            assert r[f"c{i}"] == _combo_key_py(r["hi"], r["lo"], widths, idxs), idxs
    # the 2-band 64-bit-total degenerate config (max_hamming=0, combo=2)
    w2 = band_widths(2, 128)
    c2 = [_combo_key_expr("hi", "lo", w2, (0, 1)).alias("c")]
    got = df.select("hi", "lo", *c2).collect()
    for r in got:
        assert r["c"] == _combo_key_py(r["hi"], r["lo"], w2, (0, 1))
