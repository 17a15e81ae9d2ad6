"""Simhash near-duplicate retrieval — banded LSH join + exact Hamming rerank.

The Spark re-expression of the reference's simprint similarity search
(HNSW candidate fetch + hamming scoring,
iscc_search/indexes/simprint/usearch_core.py:137-269): the 64-bit simhash is
cut into ``n_bands`` bit-bands; docs sharing any band value are candidates
(an LSH equi-join — no pairwise scan); candidates are verified JVM-side with
bit_count(xor) and scored 1 - d/64 exactly as the reference scores
1 - hamming/ndim (usearch_core.py:180-182).

Scale: the join shuffles (band, key) pairs only; Zipf-band skew is handled
by AQE skew-join splitting; candidate verification is a codegen'd bitop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iscc_search_spark.functions.simhash import hamming_expr, neardup_score_expr


def simhash_bands(
    docs: DataFrame, simhash_col: str = "simhash", n_bands: int = 8
) -> DataFrame:
    """(doc_id, band, key): the simhash split into n_bands bit-slices.
    n_bands=1 (max_hamming=0) degrades to equality on the hash itself —
    a 64-bit mask literal would overflow LongType."""
    if n_bands == 1:
        return docs.select(
            "doc_id", F.lit(0).alias("band"), F.col(simhash_col).alias("key")
        )
    width = 64 // n_bands
    mask = (1 << width) - 1
    # ONE scan of the source: the n_bands (band, key) rows per doc come
    # from a JVM explode of struct literals (n_bands unioned selects each
    # re-scan the relation — and re-run any upstream UDF — per band)
    entries = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col(simhash_col), b * width)
            .bitwiseAND(F.lit(mask))
            .alias("key"),
        )
        for b in range(n_bands)
    ]
    return docs.select("doc_id", F.explode(F.array(*entries)).alias("e")).select(
        "doc_id", F.col("e.band").alias("band"), F.col("e.key").alias("key")
    )


def simhash_neardup_pairs(
    docs: DataFrame,
    simhash_col: str = "simhash",
    max_hamming: int = 6,
    n_bands: int = 8,
) -> DataFrame:
    """(doc1, doc2, hamming, score): pairs within max_hamming bits.

    Pigeonhole: a pair with hamming <= n_bands - 1 must share at least one
    band, so recall is exact iff max_hamming < n_bands.  Asserted here —
    a silent recall gap is worse than a loud config error (a pair differing
    in exactly n_bands bits spread one per band would be missed, and an
    oracle that mirrors the same banding cannot detect it).
    """
    if max_hamming >= n_bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs n_bands > max_hamming "
            f"(got {n_bands}) for exact pigeonhole recall"
        )
    bands = simhash_bands(docs, simhash_col, n_bands)
    l, r = bands.alias("l"), bands.alias("r")
    cands = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc1"), F.col("r.doc_id").alias("doc2"))
        .distinct()
    )
    sh = docs.select("doc_id", F.col(simhash_col).alias("sh"))
    return (
        cands.join(sh.select(F.col("doc_id").alias("doc1"), F.col("sh").alias("sh1")), "doc1")
        .join(sh.select(F.col("doc_id").alias("doc2"), F.col("sh").alias("sh2")), "doc2")
        .withColumn("hamming", hamming_expr(F.col("sh1"), F.col("sh2")).cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select(
            "doc1",
            "doc2",
            "hamming",
            neardup_score_expr(F.col("sh1"), F.col("sh2")).alias("score"),
        )
    )
