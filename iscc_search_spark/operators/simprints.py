"""Chunk-level (granular) search — the reference's second query family.

The reference indexes per-segment "simprints" (headerless simhashes with
offset/size) and answers: given a query's segment simprints, which assets
contain matching segments, scored by IDF/coverage weighting
(iscc_search/indexes/simprint/lmdb_ops.py:253-301 exact search,
usearch_core.py:171-236 approx search).  Spark-first re-expression:

- documents are segmented into fixed ``seg_tokens`` token windows; each
  window gets the same 64-bit simhash as whole docs (functions/simhash.py)
  -> a ``simprints`` table (doc_id, seg_idx, n_tokens, offset, size,
  simhash) — (offset, size) is the BYTE span of the segment in the
  canonical (NFC-normalized, lowercased) text, the analogue of the
  reference's IsccChunk pointer (schema.py:260-320);
- a query text is segmented identically; candidate (doc_seg, query_seg)
  pairs come from a banded-LSH equi-join — the 64-bit simhash is cut into
  ``n_bands`` near-equal bit slices and pairs sharing any (band, key)
  are candidates.  With n_bands > max_hamming the pigeonhole principle
  makes recall EXACT (a pair within max_hamming differs in fewer bands
  than exist), so the prune is invisible to correctness while scanning
  only hash-colliding segments instead of the whole simprints table;
- scoring (frozen, oracle-verified): per (doc, query_seg) keep the BEST
  similarity 1 - hamming/64 (A1 max-combine), then
      score(doc) = sum over query segs of best_sim / n_query_segs
  — unmatched query segments contribute 0, the coverage penalty of the
  reference's A7 (usearch_core.py:220-236).  All sims are multiples of
  1/64 (dyadic), so sums are EXACT in float64 regardless of order.

Scale note: at max_hamming=12 the 13 required bands are ~5 bits wide, so
the expected candidate fraction is ~n_bands/2^width ≈ 40% of a full scan —
a modest prune; at serving-typical thresholds (<=7, 8-bit bands) it is
~3%.  Selectivity improves exponentially as the threshold tightens; the
shape (equi-join on (band, key), hamming verify JVM-side) is the same one
the near-dup self-join uses and never degenerates to an all-pairs scan.
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
from iscc_search_spark.functions.textnorm import SEG_TOKENS, token_spans_py

_token_spans = token_spans_py  # query-side tokenizer (shared with stage A)


def segment_simhashes_py(
    text: str, seg_tokens: int = SEG_TOKENS
) -> list[tuple[int, int, int, int, int]]:
    """[(seg_idx, n_tokens, offset, size, simhash)] for one text
    (driver/oracle path; offset/size are byte spans in the canonical text)."""
    import numpy as np

    toks, spans = _token_spans(text)
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
        start_b = spans[i][0]
        end_b = spans[min(i + seg_tokens, len(toks)) - 1][1]
        metas.append((i // seg_tokens, len(window), start_b, end_b - start_b))
    if not metas:
        return []
    hashes = simhash_batch(terms_l, tfs_l)
    return [(s, n, o, z, int(h)) for (s, n, o, z), h in zip(metas, hashes)]


_SEG_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("seg_idx", T.IntegerType()),
            T.StructField("n_tokens", T.IntegerType()),
            T.StructField("offset", T.IntegerType()),
            T.StructField("size", T.IntegerType()),
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
    """(doc_id, seg_idx, n_tokens, offset, size, simhash) per segment."""
    segs = _segments_udf(seg_tokens)
    return (
        docs.select(F.col(id_col).alias("doc_id"), segs(text_col).alias("ss"))
        .select("doc_id", F.explode("ss").alias("s"))
        .select(
            "doc_id",
            F.col("s.seg_idx").alias("seg_idx"),
            F.col("s.n_tokens").alias("n_tokens"),
            F.col("s.offset").alias("offset"),
            F.col("s.size").alias("size"),
            F.col("s.simhash").alias("simhash"),
        )
    )


def band_widths(n_bands: int, bits: int = 64) -> list[tuple[int, int]]:
    """[(shift, width)] cutting ``bits`` into n_bands near-equal slices."""
    base, extra = divmod(bits, n_bands)
    out, shift = [], 0
    for i in range(n_bands):
        w = base + (1 if i < extra else 0)
        out.append((shift, w))
        shift += w
    return out


def granular_topk(
    docs: DataFrame | None,
    query_text: str,
    k: int = 10,
    max_hamming: int = 8,
    seg_tokens: int = SEG_TOKENS,
    simprints: DataFrame | None = None,
    n_bands: int | None = None,
) -> DataFrame:
    """(rank, doc_id, score, n_matched_segs) top-k docs containing segments
    similar to the query's segments — banded-LSH candidate join, exact
    recall for n_bands > max_hamming (default: max_hamming + 1 bands).

    Pass ``simprints`` (the persisted build artifact,
    operators/build.py:load_simprints) for the serving path — segmenting
    raw ``docs`` per query is the cold-start fallback only."""
    if simprints is None:
        simprints = simprints_table(docs, seg_tokens=seg_tokens)
    spark = simprints.sparkSession
    n_bands = n_bands if n_bands is not None else max_hamming + 1
    if max_hamming >= n_bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs n_bands > max_hamming "
            f"(got {n_bands}) for exact pigeonhole recall"
        )
    qsegs = segment_simhashes_py(query_text, seg_tokens)
    empty = spark.createDataFrame(
        [], "rank long, doc_id long, score double, n_matched_segs long"
    )
    if not qsegs:
        return empty
    n_q = len(qsegs)

    widths = band_widths(n_bands)
    # query side: (band, key, q_seg, q_sim) literals — tiny, broadcast.
    # A full-width band (n_bands=1 <=> max_hamming=0) uses the SIGNED hash
    # itself as the key — a 64-bit mask literal would overflow LongType.
    q_rows = []
    for s, _, _, _, h in qsegs:
        uh = h & ((1 << 64) - 1)
        for b, (shift, w) in enumerate(widths):
            key = h if w >= 64 else (uh >> shift) & ((1 << w) - 1)
            q_rows.append((b, key, s, h))
    q = spark.createDataFrame(q_rows, "band int, key long, q_seg int, q_sim long")

    # index side: one (band, key) row per band per segment, JVM bit-slicing
    bands = None
    for b, (shift, w) in enumerate(widths):
        key_expr = (
            F.col("simhash")
            if w >= 64
            else F.shiftrightunsigned("simhash", shift).bitwiseAND(
                F.lit((1 << w) - 1)
            )
        )
        x = simprints.select(
            "doc_id",
            "seg_idx",
            "simhash",
            F.lit(b).alias("band"),
            key_expr.alias("key"),
        )
        bands = x if bands is None else bands.unionByName(x)

    matched = (
        bands.join(F.broadcast(q), ["band", "key"])
        .withColumn("h", hamming_expr(F.col("simhash"), F.col("q_sim")))
        .filter(F.col("h") <= max_hamming)
        .select(
            "doc_id",
            "seg_idx",
            "q_seg",
            neardup_score_expr(F.col("simhash"), F.col("q_sim")).alias("sim"),
        )
        .dropDuplicates(["doc_id", "seg_idx", "q_seg"])
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
