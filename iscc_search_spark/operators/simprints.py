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


def _band_combos(n_bands: int, combo: int) -> list[tuple[int, ...]]:
    from itertools import combinations

    return list(combinations(range(n_bands), combo))


def _combo_key_py(h: int, widths, idxs) -> int:
    if len(idxs) == 1 and widths[idxs[0]][1] >= 64:
        return h  # full-width band: the SIGNED value (mirrors the expr)
    uh = h & ((1 << 64) - 1)
    key = 0
    for bi in idxs:
        shift, w = widths[bi]
        key = (key << w) | ((uh >> shift) & ((1 << w) - 1))
    return key


def _combo_key_expr(col, widths, idxs):
    key = None
    for bi in idxs:
        shift, w = widths[bi]
        if w >= 64:  # full-width single band -> the value itself
            return F.col(col) if isinstance(col, str) else col
        s = F.shiftrightunsigned(col, shift).bitwiseAND(F.lit((1 << w) - 1))
        key = s if key is None else F.shiftleft(key, w).bitwiseOR(s)
    return key


def _banded_candidates(
    simprints: DataFrame, qsegs, n_bands: int, combo: int
) -> DataFrame:
    """(doc_id, seg_idx, simhash, q_seg, q_sim) candidate pairs sharing at
    least one ``combo``-band key.

    combo=1 is classic LSH banding (exact recall iff hamming < n_bands);
    combo=c keys on every c-subset of bands: a pair within hamming h has
    >= n_bands - h clean bands, so recall is exact iff
    n_bands - max_hamming >= c while each key carries c bands' bits —
    exponentially more selective at high thresholds (the multi-piece
    pigeonhole generalization).  ONE scan of the simprints table: keys are
    generated by a JVM explode of C(n_bands, combo) struct literals, never
    a per-combo re-scan; a full-width band (n_bands=1) keys on the SIGNED
    hash itself (a 64-bit mask literal would overflow LongType)."""
    spark = simprints.sparkSession
    widths = band_widths(n_bands)
    combos = _band_combos(n_bands, combo)

    q_rows = []
    for s, _, _, _, h in qsegs:
        for cid, idxs in enumerate(combos):
            q_rows.append((cid, _combo_key_py(h, widths, idxs), s, h))
    q = spark.createDataFrame(q_rows, "band int, key long, q_seg int, q_sim long")

    entries = [
        F.struct(
            F.lit(cid).alias("band"),
            _combo_key_expr("simhash", widths, idxs).alias("key"),
        )
        for cid, idxs in enumerate(combos)
    ]
    bands = simprints.select(
        "doc_id", "seg_idx", "simhash", F.explode(F.array(*entries)).alias("e")
    ).select("doc_id", "seg_idx", "simhash", F.col("e.band").alias("band"),
             F.col("e.key").alias("key"))
    return bands.join(F.broadcast(q), ["band", "key"])


def granular_candidate_fraction(
    simprints: DataFrame,
    query_text: str,
    max_hamming: int = 8,
    seg_tokens: int = SEG_TOKENS,
    n_bands: int | None = None,
    combo: int = 1,
) -> float:
    """Measured prune selectivity: distinct candidate (segment, query_seg)
    pairs admitted by the banded join, as a fraction of the full cross
    product — the bench's 'how much of a scan did the prune save' metric."""
    qsegs = segment_simhashes_py(query_text, seg_tokens)
    if not qsegs:
        return 0.0
    n_bands = n_bands if n_bands is not None else max_hamming + combo
    cand = (
        _banded_candidates(simprints, qsegs, n_bands, combo)
        .select("doc_id", "seg_idx", "q_seg")
        .distinct()
        .count()
    )
    total = simprints.count() * len(qsegs)
    return cand / total if total else 0.0


def granular_topk(
    docs: DataFrame | None,
    query_text: str,
    k: int = 10,
    max_hamming: int = 8,
    seg_tokens: int = SEG_TOKENS,
    simprints: DataFrame | None = None,
    n_bands: int | None = None,
    combo: int = 1,
    bands: DataFrame | None = None,
    bands_n: int = 13,
) -> DataFrame:
    """(rank, doc_id, score, n_matched_segs) top-k docs containing segments
    similar to the query's segments — banded-LSH candidate join, exact
    recall for n_bands >= max_hamming + combo (default bands: exactly
    that).  ``combo`` keys on combo-band subsets: combo=2/3 keeps recall
    exact while pruning far harder at high thresholds (e.g. max_hamming=12:
    13 single bands admit ~40% of segments, 91 two-band keys ~16%, 455
    three-band keys ~6%).

    Pass ``simprints`` (the persisted build artifact,
    operators/build.py:load_simprints) for the serving path — segmenting
    raw ``docs`` per query is the cold-start fallback only.  Pass
    ``bands`` (load_simprint_bands, written at ``bands_n`` fixed bands) to
    fetch candidates by KEYED LOOKUP from the persisted LSH table instead
    of banding the simprints scan per query; recall stays exact for
    max_hamming < bands_n (pigeonhole on the frozen banding)."""
    if bands is not None:
        if max_hamming >= bands_n:
            raise ValueError(
                f"max_hamming={max_hamming} exceeds the persisted band "
                f"table's exact-recall bound (bands_n={bands_n})"
            )
        spark = bands.sparkSession
    else:
        if simprints is None:
            simprints = simprints_table(docs, seg_tokens=seg_tokens)
        spark = simprints.sparkSession
    n_bands = n_bands if n_bands is not None else max_hamming + combo
    if bands is None and max_hamming > n_bands - combo:
        raise ValueError(
            f"max_hamming={max_hamming} needs n_bands >= max_hamming + combo "
            f"(got n_bands={n_bands}, combo={combo}) for exact recall"
        )
    qsegs = segment_simhashes_py(query_text, seg_tokens)
    empty = spark.createDataFrame(
        [], "rank long, doc_id long, score double, n_matched_segs long"
    )
    if not qsegs:
        return empty
    n_q = len(qsegs)

    if bands is not None:
        widths = band_widths(bands_n)
        q_rows = []
        for s, _, _, _, h in qsegs:
            uh = h & ((1 << 64) - 1)
            for b, (shift, w) in enumerate(widths):
                q_rows.append((b, (uh >> shift) & ((1 << w) - 1), s, h))
        q = spark.createDataFrame(
            q_rows, "band int, key long, q_seg int, q_sim long"
        )
        cands = bands.join(F.broadcast(q), ["band", "key"])
    else:
        cands = _banded_candidates(simprints, qsegs, n_bands, combo)
    matched = (
        cands
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
