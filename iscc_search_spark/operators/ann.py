"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force top-k — the correctness baseline.
  The dot product is an index-ordered JVM fold (zip_with + aggregate), so
  float64 sums are bit-identical to any engine that folds in index order.
- ``rph_ann_topk``: random-hyperplane LSH (the scale path) — signs of dot
  products with seeded Gaussian planes give a 64-bit signature; candidates
  come from banded signature equality and are exactly re-ranked.  The
  candidate-fetch + exact-rerank shape mirrors the reference's oversampled
  ANN search (usearch_core.py:160-196, 20x oversampling then exact scoring).

Self-exclusion (query vector is one of the indexed rows) follows the
reference's P5 filter (usearch/index.py:830-833).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot_expr(a, b):
    """Index-ordered float64 dot product of two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm_expr(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(rank, vec_id, cosine) exact top-k by cosine to the query row."""
    q = embeddings.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("qv")
    )
    scored = (
        embeddings.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != query_vec_id)  # self-exclusion (P5)
        .select(
            F.col(id_col).alias("vec_id"),
            (
                _dot_expr(F.col(vec_col), F.col("qv"))
                / (_norm_expr(F.col(vec_col)) * _norm_expr(F.col("qv")))
            ).alias("cosine"),
        )
    )
    topk = scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return topk.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "vec_id", "cosine"
    )


def rph_planes(dim: int, n_planes: int = 64, seed: int = 42) -> np.ndarray:
    """The seeded Gaussian plane matrix — exposed so the DuckDB oracle can
    inline the exact same values as SQL literals."""
    return np.random.default_rng(seed).standard_normal((dim, n_planes))


def rph_signature_udf(dim: int, n_planes: int = 64, seed: int = 42):
    """Pandas UDF: embedding -> int64 random-hyperplane signature.

    The per-plane dot product is an INDEX-ORDERED float64 accumulation
    (not a BLAS matmul, whose reduction order is unspecified): the sign of
    a near-zero dot must be reproducible by any engine that folds in index
    order — that's what makes the banded candidates oracle-checkable.
    """
    planes = rph_planes(dim, n_planes, seed)
    weights = (np.uint64(1) << np.arange(n_planes, dtype=np.uint64))[::-1]

    @F.pandas_udf(T.LongType())
    def sig(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy()).astype(np.float64)  # (batch, dim)
        acc = np.zeros((m.shape[0], planes.shape[1]), dtype=np.float64)
        for i in range(planes.shape[0]):  # ascending dim index, ordered fold
            acc += m[:, i : i + 1] * planes[i : i + 1, :]
        packed = ((acc > 0).astype(np.uint64) * weights[None, :]).sum(
            axis=1, dtype=np.uint64
        )
        return pd.Series(packed.view(np.int64))

    return sig


def rph_ann_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    dim: int | None = None,
    n_bands: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: banded signature match -> exact rerank."""
    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    sig = rph_signature_udf(dim, 64, seed)
    with_sig = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"), sig(vec_col).alias("s")
    )
    width = 64 // n_bands
    mask = (1 << width) - 1
    bands = None
    for b in range(n_bands):
        x = with_sig.select(
            "vec_id",
            F.lit(b).alias("band"),
            F.shiftrightunsigned("s", b * width).bitwiseAND(F.lit(mask)).alias("key"),
        )
        bands = x if bands is None else bands.unionByName(x)
    qb = bands.filter(F.col("vec_id") == query_vec_id).select("band", "key")
    cand_ids = (
        bands.join(F.broadcast(qb), ["band", "key"])
        .filter(F.col("vec_id") != query_vec_id)
        .select("vec_id")
        .distinct()
    )
    q = with_sig.filter(F.col("vec_id") == query_vec_id).select(
        F.col("v").alias("qv")
    )
    scored = (
        with_sig.join(cand_ids, "vec_id", "left_semi")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            (
                _dot_expr(F.col("v"), F.col("qv"))
                / (_norm_expr(F.col("v")) * _norm_expr(F.col("qv")))
            ).alias("cosine"),
        )
    )
    topk = scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return topk.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "vec_id", "cosine"
    )
