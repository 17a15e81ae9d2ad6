"""iscc_search_spark — a PySpark-native full-text inverted-index + BM25 engine.

A from-scratch, Spark-first re-expression of the capabilities of
iscc/iscc-search (reference at /root/reference, read-only): posting-list
construction, merge, compression, top-k BM25 scoring, ISCC-style per-document
simhash for near-duplicate filtering, resumable partition-checkpointed builds,
plus the training-data-pipeline operators a 100 TB webtext corpus needs
(dedup, similarity search, text analysis).

Design stance (SURVEY.md §7): declarative DataFrame plans let Catalyst handle
scans, pruning, join strategy, partial aggregation and distributed top-k; all
custom per-row compute is vectorized (numpy kernels inside Arrow-batched
pandas UDFs) — never row-at-a-time Python.
"""

__version__ = "0.1.0"

from iscc_search_spark.config import BM25Config, EngineConfig  # noqa: F401
