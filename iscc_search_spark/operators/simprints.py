"""Chunk-level (granular) search — the reference's second query family.

The reference indexes per-segment "simprints" (headerless simhashes with
offset/size) and answers: given a query's segment simprints, which assets
contain matching segments, scored by IDF/coverage weighting
(iscc_search/indexes/simprint/lmdb_ops.py:253-301 exact search,
usearch_core.py:171-236 approx search).  Spark-first re-expression:

- documents are segmented into fixed ``seg_tokens`` token windows; each
  window gets the same 64-bit simhash as whole docs (functions/simhash.py)
  -> a ``simprints`` table (doc_id, seg_idx, n_tokens, simhash) — the
  analogue of the reference's chunk-pointer postings (doc, offset, size);
- a query text is segmented identically; candidate (doc_seg, query_seg)
  pairs with hamming <= max_hamming are matched (banded-LSH join at scale;
  the small query side is broadcast);
- scoring (frozen, oracle-verified): per (doc, query_seg) keep the BEST
  similarity 1 - hamming/64 (A1 max-combine), then
      score(doc) = sum over query segs of best_sim / n_query_segs
  — unmatched query segments contribute 0, the coverage penalty of the
  reference's A7 (usearch_core.py:220-236).  All sims are multiples of
  1/64 (dyadic), so sums are EXACT in float64 regardless of order.

Offsets are reported as (seg_idx, n_tokens) token coordinates rather than
byte offsets: byte spans need tokenizer span tracking that plain SQL can't
reproduce, and token coordinates are deterministic across engines.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iscc_search_spark.functions.simhash import (
    hamming_expr,
    neardup_score_expr,
    simhash_batch,
)
from iscc_search_spark.functions.textnorm import tokenize_py

SEG_TOKENS = 32


def segment_simhashes_py(text: str, seg_tokens: int = SEG_TOKENS) -> list[tuple[int, int, int]]:
    """[(seg_idx, n_tokens, simhash)] for a single text (driver/oracle)."""
    import numpy as np

    toks = tokenize_py(text)
    out = []
    terms_l, tfs_l = [], []
    metas = []
    for i in range(0, max(len(toks), 1), seg_tokens):
        window = toks[i : i + seg_tokens]
        if not window:
            break
        from collections import Counter

        c = Counter(window)
        ts = sorted(c)
        terms_l.append(np.array(ts, dtype=object))
        tfs_l.append(np.array([c[t] for t in ts], dtype=np.int64))
        metas.append((i // seg_tokens, len(window)))
    if not metas:
        return []
    hashes = simhash_batch(terms_l, tfs_l)
    return [(s, n, int(h)) for (s, n), h in zip(metas, hashes)]


_SEG_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("seg_idx", T.IntegerType()),
            T.StructField("n_tokens", T.IntegerType()),
            T.StructField("simhash", T.LongType()),
        ]
    )
)


def _segments_udf(seg_tokens: int):
    @F.pandas_udf(_SEG_SCHEMA)
    def segs(text: pd.Series) -> pd.Series:
        return text.map(
            lambda t: segment_simhashes_py(t, seg_tokens) if t is not None else []
        )

    return segs


def simprints_table(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seg_tokens: int = SEG_TOKENS,
) -> DataFrame:
    """(doc_id, seg_idx, n_tokens, simhash) — one row per segment."""
    segs = _segments_udf(seg_tokens)
    return (
        docs.select(F.col(id_col).alias("doc_id"), segs(text_col).alias("ss"))
        .select("doc_id", F.explode("ss").alias("s"))
        .select(
            "doc_id",
            F.col("s.seg_idx").alias("seg_idx"),
            F.col("s.n_tokens").alias("n_tokens"),
            F.col("s.simhash").alias("simhash"),
        )
    )


def granular_topk(
    docs: DataFrame,
    query_text: str,
    k: int = 10,
    max_hamming: int = 8,
    seg_tokens: int = SEG_TOKENS,
    simprints: DataFrame | None = None,
) -> DataFrame:
    """(rank, doc_id, score, n_matched_segs) top-k docs containing segments
    similar to the query's segments."""
    spark = docs.sparkSession
    qsegs = segment_simhashes_py(query_text, seg_tokens)
    empty = spark.createDataFrame(
        [], "rank long, doc_id long, score double, n_matched_segs long"
    )
    if not qsegs:
        return empty
    n_q = len(qsegs)
    if simprints is None:
        simprints = simprints_table(docs, seg_tokens=seg_tokens)
    q = spark.createDataFrame(
        [(s, h) for s, _, h in qsegs], "q_seg int, q_sim long"
    )
    matched = (
        simprints.crossJoin(F.broadcast(q))
        .withColumn("h", hamming_expr(F.col("simhash"), F.col("q_sim")))
        .filter(F.col("h") <= max_hamming)
        .withColumn("sim", neardup_score_expr(F.col("simhash"), F.col("q_sim")))
    )
    best = matched.groupBy("doc_id", "q_seg").agg(F.max("sim").alias("best_sim"))
    scores = best.groupBy("doc_id").agg(
        (F.sum("best_sim") / F.lit(float(n_q))).alias("score"),
        F.count("*").alias("n_matched_segs"),
    )
    topk = scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "doc_id", "score", "n_matched_segs"
    )
