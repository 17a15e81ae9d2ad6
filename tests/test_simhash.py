"""Simhash identity feature: batch==single kernel parity, Spark UDF parity,
and the near-duplicate property over the seeded corpus pairs
(1-bit/many-bit perturbation style of reference tests/conftest.py:210-228)."""

import numpy as np
from pyspark.sql import functions as F

from iscc_search_spark import corpus as corpus_mod
from iscc_search_spark.functions.simhash import (
    hamming_expr,
    simhash_batch,
    simhash_from_tf,
    simhash_udf,
)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & (2**64 - 1)).count("1")


def test_batch_equals_single():
    rng = np.random.default_rng(3)
    docs = []
    for _ in range(30):
        k = int(rng.integers(1, 50))
        terms = [f"w{int(x)}" for x in rng.integers(0, 200, size=k)]
        docs.append((terms, rng.integers(1, 6, size=k)))
    single = [simhash_from_tf(t, tf) for t, tf in docs]
    batch = simhash_batch(
        [np.array(t, dtype=object) for t, _ in docs], [tf for _, tf in docs]
    )
    assert list(batch) == single


def test_empty_doc_is_zero():
    assert simhash_from_tf([], np.array([], dtype=np.int64)) == 0


def test_spark_udf_matches_kernel(spark):
    data = [(1, ["alpha", "beta", "beta"], [1, 2, 2]), (2, [], [])]
    df = spark.createDataFrame(
        data, "doc_id long, terms array<string>, tfs array<long>"
    )
    rows = {r["doc_id"]: r["sh"] for r in df.select("doc_id", simhash_udf("terms", "tfs").alias("sh")).collect()}
    assert rows[1] == simhash_from_tf(["alpha", "beta", "beta"], np.array([1, 2, 2]))
    assert rows[2] == 0


def test_near_dup_pairs_are_close_random_pairs_are_not():
    n = 200
    table = corpus_mod.generate_pages(n)
    pairs = corpus_mod.near_dup_pairs(n)
    assert pairs, "corpus must contain seeded near-duplicates"
    texts = table.column("text").to_pylist()

    from collections import Counter

    from iscc_search_spark.functions.textnorm import tokenize_py

    def sh(text):
        c = Counter(tokenize_py(text))
        return simhash_from_tf(list(c.keys()), np.array(list(c.values())))

    hashes = [sh(t) for t in texts]
    for src, dup in pairs:
        assert _ham(hashes[src], hashes[dup]) <= 8, (src, dup)
    # random non-dup pairs sit mostly beyond the dup band (tf-weighted
    # simhash compresses distances on a Zipf-head-heavy corpus: measured
    # dup max = 6, random median = 8)
    dup_set = {frozenset(p) for p in pairs}
    rng = np.random.default_rng(0)
    far = total = 0
    for _ in range(200):
        i, j = rng.integers(0, n, size=2)
        if i == j or frozenset((int(i), int(j))) in dup_set:
            continue
        total += 1
        far += _ham(hashes[int(i)], hashes[int(j)]) > 6
    assert far / total >= 0.6


def test_hamming_expr(spark):
    df = spark.createDataFrame([(5, 3)], "a long, b long")
    assert df.select(hamming_expr("a", "b").alias("h")).collect()[0]["h"] == 2
    df2 = spark.createDataFrame([(-1, 0)], "a long, b long")
    assert df2.select(hamming_expr("a", "b").alias("h")).collect()[0]["h"] == 64
