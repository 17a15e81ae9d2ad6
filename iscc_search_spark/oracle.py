"""Single-node reference engine (dict inverted index + textbook BM25).

Plays the role the LMDB backend plays in the reference's backend-parametrized
test fixture (/root/reference/tests/conftest.py:361-398): every Spark result
must be rank-identical — docIDs AND float64 scores — to this oracle on the
reference query set (north rule).

Scoring semantics are frozen in config.BM25Config: unique query terms, summed
in ascending term order, idf = ln((N-df+0.5)/(df+0.5)+1), tie-break
(-score, doc_id) (the analogue of the reference's (-score, iscc_id_body),
iscc_search/indexes/simprint/lmdb_ops.py:249).
"""

from __future__ import annotations

import math
from collections import Counter

from iscc_search_spark.config import BM25Config
from iscc_search_spark.functions.textnorm import tokenize_py


class OracleIndex:
    def __init__(self, bm25: BM25Config | None = None):
        self.bm25 = bm25 or BM25Config()
        self.postings: dict[str, dict[int, int]] = {}  # term -> {doc_id: tf}
        self.doc_len: dict[int, int] = {}

    def add(self, doc_id: int, text: str) -> None:
        toks = tokenize_py(text)
        self.doc_len[doc_id] = len(toks)
        for term, tf in Counter(toks).items():
            self.postings.setdefault(term, {})[doc_id] = tf

    @property
    def n_docs(self) -> int:
        return len(self.doc_len)

    @property
    def avgdl(self) -> float:
        return sum(self.doc_len.values()) / self.n_docs

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, {}))
        n = self.n_docs
        return math.log((n - df + 0.5) / (df + 0.5) + 1.0)

    def search(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Top-k (doc_id, score), exhaustive term-at-a-time scoring.

        Terms are deduplicated and iterated in ascending order so the float64
        accumulation order is identical to the distributed scorer's ordered
        per-doc sum (SURVEY.md §7.5 rank-identity-under-floats).
        """
        k1, b = self.bm25.k1, self.bm25.b
        n, avgdl = self.n_docs, self.avgdl
        terms = sorted(set(tokenize_py(query)))
        scores: dict[int, float] = {}
        for term in terms:
            plist = self.postings.get(term)
            if not plist:
                continue
            idf = self.idf(term)
            for doc_id, tf in plist.items():
                dl = self.doc_len[doc_id]
                # factored as idf * tfnorm so the engine can precompute the
                # query-independent tfnorm (batch path) — association is part
                # of the frozen spec (rank-identity is bit-exact)
                s = idf * ((tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl)))
                scores[doc_id] = scores.get(doc_id, 0.0) + s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]


def build_oracle(rows: list[tuple[int, str]], bm25: BM25Config | None = None) -> OracleIndex:
    idx = OracleIndex(bm25)
    for doc_id, text in rows:
        idx.add(doc_id, text)
    return idx
