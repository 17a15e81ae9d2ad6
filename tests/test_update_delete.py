"""Incremental upsert/delete (true B4): post-update queries return the new
ranking, only the affected docs partitions rewrite, deletes drop postings —
the Spark analogue of the reference's delete-stale-then-insert update txn
(usearch/index.py:337-348)."""

import os

import pytest
from pyspark.sql import functions as F

from iscc_search_spark.catalog import IndexCatalog
from iscc_search_spark.config import EngineConfig
from iscc_search_spark.corpus import doc_id_for_url, generate_queries
from iscc_search_spark.operators.build import build_index, delete_docs, upsert_docs
from iscc_search_spark.operators.wand import bm25_wand_topk
from iscc_search_spark.oracle import build_oracle

CFG = EngineConfig(block_size=16)
N_PARTS = 8


def _part_mtimes(cat: IndexCatalog) -> dict[int, float]:
    out = {}
    for d in os.listdir(cat.docs):
        if d.startswith("part="):
            p = os.path.join(cat.docs, d)
            out[int(d.split("=")[1])] = max(
                os.path.getmtime(os.path.join(p, f)) for f in os.listdir(p)
            )
    return out


def _oracle_for(rows):
    return build_oracle([(doc_id_for_url(u), t) for u, t in rows])


@pytest.fixture()
def built(spark, pages_df, tmp_path):
    d = str(tmp_path / "idx")
    build_index(spark, pages_df, d, cfg=CFG, n_parts=N_PARTS, n_shards=4, group_size=N_PARTS)
    return d


def test_upsert_changes_ranking_and_touches_one_part(spark, pages_df, built):
    cat = IndexCatalog(built)
    before = _part_mtimes(cat)

    target_url = pages_df.select("url").orderBy("url").first()["url"]
    new_text = "freshly rewritten document " + "t00000 " * 30
    delta = spark.createDataFrame(
        [(target_url, new_text, "en")], "url string, text string, lang string"
    )
    parts = upsert_docs(spark, delta, built, cfg=CFG)
    assert len(parts) == 1

    after = _part_mtimes(cat)
    changed = {p for p in after if after[p] != before.get(p)}
    assert changed == set(parts)  # only the affected partition rewrote

    # post-update ranking matches an oracle over the UPDATED corpus
    rows = [
        (r["url"], new_text if r["url"] == target_url else r["text"])
        for r in pages_df.select("url", "text").collect()
    ]
    oracle = _oracle_for(rows)
    for q in ["t00000 t00001", generate_queries(10)[6]]:
        got = [
            (r["doc_id"], r["score"])
            for r in bm25_wand_topk(spark, built, q, k=10).orderBy("rank").collect()
        ]
        assert got == oracle.search(q, k=10), q


def test_upsert_inserts_new_doc(spark, pages_df, built):
    new_url = "https://example999.test/p/brandnew"
    delta = spark.createDataFrame(
        [(new_url, "zzbrandnew zzbrandnew unique tokens here", "en")],
        "url string, text string, lang string",
    )
    upsert_docs(spark, delta, built, cfg=CFG)
    got = bm25_wand_topk(spark, built, "zzbrandnew", k=5).collect()
    assert [r["doc_id"] for r in got] == [doc_id_for_url(new_url)]
    cat = IndexCatalog(built)
    assert cat.read_meta()["n_docs"] == 201


def test_delete_removes_doc_and_postings(spark, pages_df, built):
    cat = IndexCatalog(built)
    target_url = pages_df.select("url").orderBy("url").first()["url"]
    target_id = doc_id_for_url(target_url)

    delete_docs(spark, [target_url], built, cfg=CFG)
    assert cat.read_meta()["n_docs"] == 199
    docs = spark.read.parquet(cat.docs)
    assert docs.filter(F.col("doc_id") == target_id).count() == 0

    # rank-identity vs an oracle over the corpus WITHOUT the deleted doc
    rows = [
        (r["url"], r["text"])
        for r in pages_df.filter(F.col("url") != target_url)
        .select("url", "text")
        .collect()
    ]
    oracle = _oracle_for(rows)
    for q in generate_queries(16)[6:10]:
        got = [
            (r["doc_id"], r["score"])
            for r in bm25_wand_topk(spark, built, q, k=10).orderBy("rank").collect()
        ]
        assert got == oracle.search(q, k=10), q
        assert target_id not in [d for d, _ in got]
