"""Resumable inverted-index build (the reference's write path, Spark-first).

Two stages, mirroring the reference's "LMDB source of truth + rebuildable
derived indexes" model (docs/explanation/architecture.md:117-118):

Stage A — **segments** (resumable, checkpointed).  Input pages are hashed
into ``n_parts`` deterministic partitions (pmod(xxhash64(url))); partitions
are processed in groups, each group committed with a per-partition
order-independent fingerprint row in ``_checkpoints``.  A re-run skips
fingerprint-matched partitions — the Spark analogue of the reference's
idempotent no-op fast path (iscc_search/indexes/usearch/index.py:311-336,
564-587: BLAKE2b over sorted simprint triples; here xor-combined BLAKE2b
over (url, text) rows, equally order-independent).

Stage B — **postings + docs + term_stats** (derived, deterministic,
idempotent full overwrite from segments).  Document-sharded layout: every
doc belongs to shard pmod(xxhash64(doc_id), n_shards); each (shard, term)
posting run is sorted ascending by doc_id and packed into fixed-size blocks
(delta+varbyte doc_ids, varbyte tfs, varbyte doc_lens) with per-block
max-impact metadata (block-max WAND).  Doc-sharding IS the head-term
salting demanded by the north rule: a Zipf head term's postings are split
across all shards by a deterministic, score-invisible doc hash and merge
losslessly at query time (replacing the reference's lossy dup_limit=1000
cap, iscc_search/indexes/simprint/lmdb_ops.py:139-166).

Scale notes (100 TB / 10^12 docs):
- Stage A is one scan per resume-group writing columnar segments — the
  expensive tokenize work is checkpointed, never repeated.
- Stage B shuffles once on (shard, term); AQE splits skewed reducers, and
  (shard, term) groups exceeding ``group_max_postings`` get an additional
  deterministic build_salt so no reducer ever materializes an unbounded
  group (blocks don't require global order — WAND sorts block metadata).
- Posting blocks carry doc_len inline so query scoring never joins the
  docs table (a 10^12-row join per query would dominate latency).
- All stats are exact (rank-identity forbids approximation).
"""

from __future__ import annotations

import hashlib
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iscc_search_spark.catalog import IndexCatalog
from iscc_search_spark.config import DEFAULT, EngineConfig
from iscc_search_spark.functions import codec
from iscc_search_spark.functions.hashing import doc_id_udf
from iscc_search_spark.functions.textnorm import tok_tf_simhash_udf

POSTINGS_SCHEMA = (
    "shard int, bucket int, term string, block_id int, n int, "
    "min_doc long, max_doc long, doc_ids binary, tfs binary, dls binary, "
    "block_max_tfnorm double"
)


@dataclass
class BuildResult:
    n_docs: int
    avgdl: float
    parts_built: list[int]
    parts_skipped: list[int]
    secs: float


# --- stage A: segments with per-partition checkpoints ------------------------


def _fingerprints(pages: DataFrame) -> dict[int, tuple[int, int, int]]:
    """part -> (xor_hi, xor_lo, n_docs): order-independent content hash."""
    import pandas as pd  # noqa: F811
    from pyspark.sql import types as T

    @F.pandas_udf(T.StructType([
        T.StructField("hi", T.LongType()),
        T.StructField("lo", T.LongType()),
    ]))
    def row_hash(url: pd.Series, text: pd.Series) -> pd.DataFrame:
        hi = np.empty(len(url), dtype=np.int64)
        lo = np.empty(len(url), dtype=np.int64)
        for i, (u, t) in enumerate(zip(url.to_numpy(), text.to_numpy())):
            d = hashlib.blake2b(
                (u + "\x00" + t).encode("utf-8"), digest_size=16
            ).digest()
            hi[i] = int.from_bytes(d[:8], "big", signed=True)
            lo[i] = int.from_bytes(d[8:], "big", signed=True)
        return pd.DataFrame({"hi": hi, "lo": lo})

    rows = (
        pages.withColumn("h", row_hash("url", "text"))
        .groupBy("part")
        .agg(
            F.bit_xor("h.hi").alias("hi"),
            F.bit_xor("h.lo").alias("lo"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    return {int(r["part"]): (int(r["hi"]), int(r["lo"]), int(r["n"])) for r in rows}


def _read_checkpoints(spark: SparkSession, cat: IndexCatalog) -> dict[int, tuple[int, int, int]]:
    import glob
    import os

    if not glob.glob(os.path.join(cat.checkpoints, "*.parquet")):
        return {}
    df = spark.read.parquet(cat.checkpoints)
    out = {}
    for r in df.collect():
        out[int(r["part"])] = (int(r["hi"]), int(r["lo"]), int(r["n_docs"]))
    return out


def _append_checkpoints(cat: IndexCatalog, rows: list[dict]) -> None:
    import os
    import uuid

    os.makedirs(cat.checkpoints, exist_ok=True)
    t = pa.table(
        {
            "part": pa.array([r["part"] for r in rows], pa.int32()),
            "hi": pa.array([r["hi"] for r in rows], pa.int64()),
            "lo": pa.array([r["lo"] for r in rows], pa.int64()),
            "n_docs": pa.array([r["n_docs"] for r in rows], pa.int64()),
            "secs": pa.array([r["secs"] for r in rows], pa.float64()),
        }
    )
    pq.write_table(t, os.path.join(cat.checkpoints, f"ckpt-{uuid.uuid4().hex}.parquet"))


def _append_metrics(cat: IndexCatalog, rows: list[dict]) -> None:
    import os
    import uuid

    if not rows:
        return
    os.makedirs(cat.metrics, exist_ok=True)
    cols = {k: [r[k] for r in rows] for k in rows[0]}
    pq.write_table(pa.table(cols), os.path.join(cat.metrics, f"m-{uuid.uuid4().hex}.parquet"))


def _normalize_input(pages: DataFrame) -> DataFrame:
    """Accept either a pages table (url-keyed; doc_id derived via blake2b)
    or a documents table (doc_id-keyed; synthetic doc:// url)."""
    cols = set(pages.columns)
    lang = F.col("lang") if "lang" in cols else F.lit("und")
    if "url" in cols:
        out = pages.select(
            "url", F.col("text"), lang.alias("lang")
        ).withColumn("doc_id", doc_id_udf("url"))
    elif "doc_id" in cols:
        out = pages.select(
            F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
            "text",
            lang.alias("lang"),
            "doc_id",
        )
    else:
        raise ValueError("input needs a url or doc_id column")
    return out


def build_segments(
    spark: SparkSession,
    pages: DataFrame,
    cat: IndexCatalog,
    cfg: EngineConfig = DEFAULT,
    n_parts: int = 16,
    group_size: int = 8,
    resume: bool = True,
    run_id: str = "run",
    fail_after_groups: int | None = None,
) -> tuple[list[int], list[int]]:
    """Stage A.  Returns (parts_built, parts_skipped).

    ``fail_after_groups`` injects a mid-build crash for the kill/rerun
    resumability test (FIXTURES.md §6).
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    pages_p = _normalize_input(pages).withColumn(
        "part", F.pmod(F.xxhash64("url"), F.lit(n_parts)).cast("int")
    )
    want = _fingerprints(pages_p)
    have = _read_checkpoints(spark, cat) if resume else {}
    skipped = sorted(p for p in want if have.get(p) == want[p])
    missing = sorted(p for p in want if have.get(p) != want[p])

    built: list[int] = []
    groups = [missing[i : i + group_size] for i in range(0, len(missing), group_size)]
    for gi, group in enumerate(groups):
        if fail_after_groups is not None and gi >= fail_after_groups:
            raise RuntimeError(f"injected failure before group {gi}")
        t0 = time.time()
        pg = pages_p.filter(F.col("part").isin(group))
        # Cluster rows by part BEFORE the fused UDF: each write task then
        # owns exactly one part dir -> one file per partition (measured: 41
        # tasks x 32 dirs produced ~1300 tiny files whose driver-side commit
        # and later listing erased all scaling).  The raw-text shuffle is
        # cheap.  The UDF runs twice (segments + docs actions) on purpose:
        # recomputing it is cheaper than pushing multi-GB token arrays
        # through the block manager (persist measurably hurt at 16+ workers).
        enc = pg.repartition(len(group), "part").withColumn(
            "tt", tok_tf_simhash_udf("text")
        )
        seg = enc.select(
            "part",
            "doc_id",
            F.col("tt.doc_len").alias("doc_len"),
            F.explode(F.arrays_zip("tt.terms", "tt.tfs")).alias("z"),
        ).select(
            "part",
            "doc_id",
            F.col("z.terms").alias("term"),
            F.col("z.tfs").alias("tf"),
            "doc_len",
        )
        # dynamic partition overwrite -> idempotent retry per group
        seg.write.mode("overwrite").partitionBy("part").parquet(cat.segments)

        docs = enc.select(
            "part",
            "doc_id",
            "url",
            F.col("tt.doc_len").alias("doc_len"),
            F.col("tt.simhash").alias("simhash"),
            "lang",
        )
        docs.write.mode("overwrite").partitionBy("part").parquet(cat.docs)

        secs = time.time() - t0
        ck = [
            {
                "part": p,
                "hi": want[p][0],
                "lo": want[p][1],
                "n_docs": want[p][2],
                "secs": secs / len(group),
            }
            for p in group
        ]
        _append_checkpoints(cat, ck)
        _append_metrics(
            cat,
            [
                {
                    "run_id": run_id,
                    "stage": "segments",
                    "part": p,
                    "docs": want[p][2],
                    "secs": secs / len(group),
                }
                for p in group
            ],
        )
        built.extend(group)
    return built, skipped


# --- stage B: derived postings ------------------------------------------------


def _encode_blocks_fn(cfg: EngineConfig, k1: float, b: float, avgdl: float):
    """Shard-group block encoder (applyInPandas on (shard, tgroup)).

    One Python call per group, not per term: rows are lexsorted by
    (term, doc_id) in numpy, block boundaries derived vectorized, and only
    the final per-block varbyte encode loops (over ~n/block_size blocks,
    each a numpy kernel).  At 10^12 docs the group size is bounded by the
    ``build_fanout`` secondary split of the term space (tgroup), not by the
    corpus — no reducer materializes an unbounded group.
    """
    block_size = cfg.block_size
    n_buckets = cfg.term_buckets

    def encode(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        terms = pdf["term"].to_numpy()
        doc_ids = pdf["doc_id"].to_numpy()
        order = np.lexsort((doc_ids, terms))
        terms = terms[order]
        doc_ids = doc_ids[order]
        tfs = pdf["tf"].to_numpy()[order].astype(np.int64)
        dls = pdf["doc_len"].to_numpy()[order].astype(np.int64)
        tfnorm = (tfs * (k1 + 1.0)) / (tfs + k1 * (1.0 - b + b * dls / avgdl))

        n = len(terms)
        term_change = np.empty(n, dtype=bool)
        term_change[0] = True
        term_change[1:] = terms[1:] != terms[:-1]
        term_start_idx = np.flatnonzero(term_change)
        # position of each row within its term run
        run_id = np.cumsum(term_change) - 1
        pos_in_term = np.arange(n) - term_start_idx[run_id]
        block_starts = np.flatnonzero(pos_in_term % block_size == 0)
        block_ends = np.append(block_starts[1:], n)

        uniq_terms = terms[term_start_idx]
        bucket_map = {t: _bucket_of(t, n_buckets) for t in uniq_terms}

        # whole-group vectorized encode: ONE varbyte pass each for doc-id
        # deltas / tfs / dls, then per-block buffer slices (a per-block
        # numpy-call loop was the dominant stage-B cost at ~10^5 blocks)
        id_buf, id_off = codec.varbyte_encode_batch(
            codec.doc_id_delta_codes(doc_ids, block_starts)
        )
        tf_buf, tf_off = codec.varbyte_encode_batch(tfs.view(np.uint64))
        dl_buf, dl_off = codec.varbyte_encode_batch(dls.view(np.uint64))
        bmax = np.maximum.reduceat(tfnorm, block_starts)

        term_col = terms[block_starts]
        return pd.DataFrame(
            {
                "shard": np.full(len(block_starts), shard, dtype=np.int32),
                "bucket": np.array(
                    [bucket_map[t] for t in term_col], dtype=np.int32
                ),
                "term": term_col,
                "block_id": (pos_in_term[block_starts] // block_size).astype(
                    np.int32
                ),
                "n": (block_ends - block_starts).astype(np.int32),
                "min_doc": doc_ids[block_starts],
                "max_doc": doc_ids[block_ends - 1],
                "doc_ids": [
                    id_buf[id_off[s] : id_off[e]]
                    for s, e in zip(block_starts, block_ends)
                ],
                "tfs": [
                    tf_buf[tf_off[s] : tf_off[e]]
                    for s, e in zip(block_starts, block_ends)
                ],
                "dls": [
                    dl_buf[dl_off[s] : dl_off[e]]
                    for s, e in zip(block_starts, block_ends)
                ],
                "block_max_tfnorm": bmax,
            }
        )

    return encode


def _bucket_of(term: str, n_buckets: int) -> int:
    # stable python-side bucket (must match the query-side pruning filter,
    # which uses the same function on the driver)
    h = int.from_bytes(hashlib.md5(term.encode("utf-8")).digest()[:4], "big")
    return h % n_buckets


def bucket_expr(term_col, n_buckets: int):
    """JVM-side bucket — first 4 bytes of md5, matching _bucket_of."""
    c = F.col(term_col) if isinstance(term_col, str) else term_col
    return (F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long") % n_buckets).cast("int")


def build_postings(
    spark: SparkSession,
    cat: IndexCatalog,
    cfg: EngineConfig = DEFAULT,
    n_shards: int | None = None,
    run_id: str = "run",
) -> BuildResult:
    """Stage B: segments -> sharded compressed postings + term_stats + meta."""
    t0 = time.time()
    n_shards = n_shards or 16
    seg = spark.read.parquet(cat.segments)
    docs = spark.read.parquet(cat.docs)

    row = docs.agg(F.count("*").alias("n"), F.sum("doc_len").alias("s")).collect()[0]
    n_docs = int(row["n"])
    avgdl = int(row["s"]) / n_docs if n_docs else 0.0
    k1, b = cfg.bm25.k1, cfg.bm25.b

    # segments carry doc_len inline (denormalized at stage A) so stage B
    # needs NO join — the term shuffle is the build's only wide dependency
    postings_in = (
        seg.withColumn("shard", F.pmod(F.xxhash64("doc_id"), F.lit(n_shards)).cast("int"))
        .withColumn(
            "tgroup",
            F.pmod(F.xxhash64("term"), F.lit(cfg.build_fanout)).cast("int"),
        )
        .select("shard", "tgroup", "term", "doc_id", "tf", "doc_len")
    )
    blocks = (
        postings_in.groupBy("shard", "tgroup")
        .applyInPandas(_encode_blocks_fn(cfg, k1, b, avgdl), POSTINGS_SCHEMA)
    )
    # physical layout: partition dirs by bucket ONLY (the query-time prune
    # key); shard stays a column — the scorer's groupBy(shard) shuffles the
    # (tiny, compressed) candidate blocks anyway, and bucket*shard dirs
    # would explode file-listing cost on the query path.  Within each
    # bucket file rows are sorted by term so row-group min/max stats prune
    # non-query terms.
    (
        blocks.repartition("bucket")
        .sortWithinPartitions("term", "shard", "block_id")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(cat.postings)
    )

    # global exact term stats (df = posting count; (doc,term) is unique)
    stats = (
        seg.groupBy("term")
        .agg(F.count("*").alias("df"))
        .withColumn("bucket", bucket_expr("term", cfg.term_buckets))
    )
    (
        stats.repartition("bucket")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(cat.term_stats)
    )

    secs = time.time() - t0
    cat.write_meta(
        {
            "n_docs": n_docs,
            "avgdl": avgdl,
            "n_shards": n_shards,
            "block_size": cfg.block_size,
            "term_buckets": cfg.term_buckets,
            "bm25": {"k1": k1, "b": b},
            "run_id": run_id,
        }
    )
    _append_metrics(
        cat,
        [{"run_id": run_id, "stage": "postings", "part": -1, "docs": n_docs, "secs": secs}],
    )
    return BuildResult(n_docs, avgdl, [], [], secs)


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    index_dir: str,
    cfg: EngineConfig = DEFAULT,
    n_parts: int = 16,
    n_shards: int = 16,
    group_size: int = 8,
    resume: bool = True,
    run_id: str = "run",
) -> BuildResult:
    """Full build: stage A (resumable) + stage B (derived)."""
    t0 = time.time()
    cat = IndexCatalog(index_dir)
    built, skipped = build_segments(
        spark, pages, cat, cfg, n_parts, group_size, resume, run_id
    )
    res = build_postings(spark, cat, cfg, n_shards, run_id)
    return BuildResult(res.n_docs, res.avgdl, built, skipped, time.time() - t0)
