"""Engine configuration constants.

BM25 semantics are frozen here and shared by the Spark engine, the
single-node oracle (oracle.py) and the DuckDB oracle SQL, so that all three
produce bit-identical float64 scores (FIXTURES.md §7; rank-identity is the
north-rule correctness gate, mirroring the reference's deterministic
tie-break at iscc_search/indexes/simprint/lmdb_ops.py:249).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class BM25Config:
    """Textbook BM25 (Robertson/Sparck-Jones smooth idf).

    score(q, d) = sum over UNIQUE query terms t (ascending term order):
        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1)

    Summation order is fixed (ascending term) so distributed and single-node
    sums associate identically — float64 throughout.  Ties break by
    (-score, doc_id ASC), the analogue of the reference's
    (-score, iscc_id_body) ordering.
    """

    k1: float = 1.2
    b: float = 0.75


@dataclass(frozen=True)
class EngineConfig:
    """Index build + query knobs.

    Scale rationale (100 TB target):
    - ``block_size``: postings are stored as fixed-size compressed blocks with
      per-block max-score metadata (block-max WAND), the Spark analogue of the
      reference's sorted dupsort pages + threshold pruning
      (iscc_search/indexes/lmdb/index.py:408-416).
    - head-term salting is structural: every posting list is split across
      ``n_shards`` disjoint doc-hash shards (operators/build.py), plus the
      ``build_fanout`` term-group split on the encode shuffle — no single
      reducer ever owns a whole Zipf head term (replaces the reference's
      lossy dup_limit=1000 cap, lmdb_ops.py:139-166, losslessly).
    - ``term_buckets``: postings are written partitioned by
      ``pmod(hash(term), term_buckets)`` so a query touches only the buckets
      of its own terms (partition pruning; per-type vertical layout as in
      usearch/index.py:92-101).
    """

    block_size: int = 128
    term_buckets: int = 16
    # secondary split of the term space on the build shuffle: encode groups
    # are (shard, pmod(hash(term), build_fanout)) so no reducer materializes
    # an unbounded group; raise with corpus size (tasks = shards * fanout)
    build_fanout: int = 8
    bm25: BM25Config = field(default_factory=BM25Config)
    # simhash (identity feature preserved from the reference: CONTENT_TEXT
    # 64-bit similarity hash; near-dup score = 1 - hamming/64, mirroring
    # usearch_core.py:180-182)
    simhash_bits: int = 64
    # LSH banding for the simhash near-dup join: 8 bands x 8 bits
    simhash_bands: int = 8

    @property
    def band_bits(self) -> int:
        return self.simhash_bits // self.simhash_bands


DEFAULT = EngineConfig()
