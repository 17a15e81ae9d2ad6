"""Phrase retrieval from positional postings — verified against a plain
Python positional-index oracle (no text access on the engine side; the
posting positions payload is the reference's chunk-pointer analogue,
iscc_search/indexes/simprint/lmdb_ops.py:24-64)."""

import pytest

from iscc_search_spark.config import EngineConfig
from iscc_search_spark.corpus import doc_id_for_url
from iscc_search_spark.functions.textnorm import tokenize_py
from iscc_search_spark.operators.build import build_index
from iscc_search_spark.operators.phrase import phrase_match
from iscc_search_spark.operators.wand import IndexReader

CFG = EngineConfig(block_size=16)


@pytest.fixture(scope="module")
def phrase_index(spark, pages_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("phrase_index"))
    build_index(spark, pages_df, d, cfg=CFG, n_parts=4, n_shards=4, group_size=4)
    return d


@pytest.fixture(scope="module")
def token_oracle(pages_df):
    rows = pages_df.select("url", "text").collect()
    return {doc_id_for_url(r["url"]): tokenize_py(r["text"]) for r in rows}


def _oracle_phrase(token_oracle, phrase: str) -> set[int]:
    p = tokenize_py(phrase)
    out = set()
    for doc, toks in token_oracle.items():
        for i in range(len(toks) - len(p) + 1):
            if toks[i : i + len(p)] == p:
                out.add(doc)
                break
    return out


@pytest.mark.parametrize(
    "phrase",
    [
        "t00001 t00000",
        "t00000 t00002",
        "t00000 t00001 t00000",  # 3-gram
        "t00000 t00000",  # repeated term
        "zzznotaterm t00000",  # absent term -> empty
    ],
)
def test_phrase_matches_python_oracle(spark, phrase_index, token_oracle, phrase):
    reader = IndexReader(spark, phrase_index)
    got = {r["doc_id"] for r in phrase_match(spark, reader, phrase).collect()}
    want = _oracle_phrase(token_oracle, phrase)
    assert got == want, phrase


def test_some_phrase_is_nonempty(spark, phrase_index, token_oracle):
    # guard against vacuous pass: the tested phrases must match real docs
    # (t0000x are the corpus's Zipf-head tokens; repeated-term phrase too)
    assert len(_oracle_phrase(token_oracle, "t00001 t00000")) > 50
    assert len(_oracle_phrase(token_oracle, "t00000 t00000")) > 50
    assert len(_oracle_phrase(token_oracle, "t00000 t00001 t00000")) > 20


def test_positions_roundtrip_through_blocks(spark, phrase_index, token_oracle):
    """Decode every posting's positions for one term and compare with the
    token oracle exactly."""
    import numpy as np

    from iscc_search_spark.functions import codec
    from iscc_search_spark.operators.wand import (
        decode_block_ids,
        decode_block_positions,
    )

    reader = IndexReader(spark, phrase_index)
    term = "t00005"
    rows = reader.candidate_blocks([term]).collect()
    assert rows
    got: dict[int, list[int]] = {}
    for r in rows:
        n = int(r["n"])
        ids = decode_block_ids(int(r["min_doc"]), n, r["doc_ids"])
        tfs = codec.for_unpack(r["tfs"], n).view(np.int64)
        pos = decode_block_positions(r["poss"], tfs)
        bounds = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(tfs, out=bounds[1:])
        for i, doc in enumerate(ids):
            got[int(doc)] = [int(x) for x in pos[bounds[i] : bounds[i + 1]]]
    want = {
        doc: [i for i, t in enumerate(toks) if t == term]
        for doc, toks in token_oracle.items()
        if term in toks
    }
    assert got == want
