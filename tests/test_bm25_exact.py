"""Rank-identity: Spark exhaustive BM25 vs single-node oracle.

The Spark engine must match the oracle docID-for-docID AND bit-for-bit on
float64 scores (north rule), across multiple partition counts
(SURVEY.md §7.5 item 1)."""

import pytest
from pyspark.sql import functions as F

from iscc_search_spark.corpus import doc_id_for_url, generate_queries
from iscc_search_spark.functions.textnorm import tokenize_py
from iscc_search_spark.operators.query import (
    bm25_exact_topk,
    doc_lengths,
    doc_term_tf,
)
from iscc_search_spark.oracle import build_oracle


@pytest.fixture(scope="module")
def docs(spark, pages_df):
    from iscc_search_spark.functions.hashing import doc_id_udf

    df = pages_df.select(
        doc_id_udf(F.col("url")).alias("doc_id"), "text"
    ).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def oracle(pages_df):
    rows = pages_df.select("url", "text").collect()
    return build_oracle([(doc_id_for_url(r["url"]), r["text"]) for r in rows])


def test_doc_term_tf_matches_oracle(docs, oracle):
    got = {
        (r["term"], r["doc_id"]): r["tf"]
        for r in doc_term_tf(docs).collect()
    }
    want = {
        (term, doc): tf
        for term, plist in oracle.postings.items()
        for doc, tf in plist.items()
    }
    assert got == want


def test_doc_lengths_match(docs, oracle):
    got = {r["doc_id"]: r["doc_len"] for r in doc_lengths(docs).collect()}
    assert got == oracle.doc_len


@pytest.mark.parametrize("n_queries", [25])
def test_rank_identical_topk(docs, oracle, n_queries):
    queries = generate_queries(n_queries)
    tf_df = doc_term_tf(docs).cache()
    lens_df = doc_lengths(docs).cache()
    checked_nonempty = 0
    for q in queries:
        want = oracle.search(q, k=10)
        got = [
            (r["doc_id"], r["score"])
            for r in bm25_exact_topk(docs, q, k=10, tf_df=tf_df, lens_df=lens_df)
            .orderBy("rank")
            .collect()
        ]
        assert got == want, f"query={q!r}"
        if want:
            checked_nonempty += 1
    assert checked_nonempty > 0
    # OOV query -> empty both sides
    assert bm25_exact_topk(docs, "zzoov0xq", k=10, tf_df=tf_df, lens_df=lens_df).count() == 0
    assert oracle.search("zzoov0xq") == []


def test_rank_identity_across_partitionings(docs, oracle):
    """Different partition counts must not change float sums (ordered agg)."""
    q = generate_queries(10)[5]
    want = oracle.search(q, k=10)
    for nparts in (1, 7):
        d = docs.repartition(nparts)
        got = [
            (r["doc_id"], r["score"])
            for r in bm25_exact_topk(d, q, k=10).orderBy("rank").collect()
        ]
        assert got == want, nparts
