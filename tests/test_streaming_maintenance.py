"""Streaming index maintenance (micro-batch -> incremental upsert txn) and
the stateful first-seen dedup operator (applyInPandasWithState)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from iscc_search_spark import corpus as corpus_mod
from iscc_search_spark.config import EngineConfig
from iscc_search_spark.corpus import doc_id_for_url
from iscc_search_spark.operators.build import build_index
from iscc_search_spark.operators.wand import IndexReader, bm25_wand_topk_local
from iscc_search_spark.streaming.ingest import (
    first_seen_stream,
    stream_index_maintenance,
)

CFG = EngineConfig(block_size=16)


def _write_update_batch(spark, path, rows):
    from iscc_search_spark.sources.pages import PAGES_SCHEMA

    df = spark.createDataFrame(
        [
            (u, __import__("datetime").datetime(2026, 1, 1), body.encode(), None, "en")
            for u, body in rows
        ],
        PAGES_SCHEMA,
    ).withColumn("html", F.concat(F.lit(b"<html><body>"), "html", F.lit(b"</body></html>")))
    df.write.mode("append").parquet(path)


def test_stream_maintenance_applies_incremental_upserts(spark, pages_df, tmp_path):
    idx = str(tmp_path / "idx")
    build_index(spark, pages_df, idx, cfg=CFG, n_parts=4, n_shards=4, group_size=4)
    stream_in = str(tmp_path / "updates")
    ckpt = str(tmp_path / "ckpt")

    url0 = pages_df.select("url").orderBy("url").first()["url"]
    _write_update_batch(
        spark, stream_in,
        [(url0, "qqstreamed replacement body"), ("http://s.test/new", "qqstreamed fresh page")],
    )
    q = stream_index_maintenance(spark, stream_in, idx, ckpt)
    q.awaitTermination(120)

    r = IndexReader(spark, idx)
    got = sorted(bm25_wand_topk_local(r, "qqstreamed")["doc_id"])
    assert got == sorted([doc_id_for_url(url0), doc_id_for_url("http://s.test/new")])
    assert r.n_docs == 201  # one replaced + one inserted

    # second batch: another update flows through the SAME checkpoint lineage
    _write_update_batch(spark, stream_in, [("http://s.test/new2", "qqsecondwave")])
    q2 = stream_index_maintenance(spark, stream_in, idx, ckpt)
    q2.awaitTermination(120)
    got2 = list(bm25_wand_topk_local(r, "qqsecondwave")["doc_id"])
    assert got2 == [doc_id_for_url("http://s.test/new2")]
    assert r.n_docs == 202


def test_first_seen_stateful_dedup(spark, tmp_path):
    stream_in = str(tmp_path / "dups")
    # duplicate urls within one batch AND across batches
    _write_update_batch(
        spark, stream_in,
        [("http://d.test/a", "one"), ("http://d.test/a", "one dup"),
         ("http://d.test/b", "two")],
    )
    out_dir = str(tmp_path / "fs_out")

    def run_pass():
        # durable foreachBatch sink: memory sinks cannot recover from a
        # checkpoint, and the cross-run state is exactly what we test
        q = (
            first_seen_stream(spark, stream_in)
            .writeStream.foreachBatch(
                lambda df, _e: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "fs_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_pass()
    rows = spark.read.parquet(out_dir).collect()
    assert sorted(r["url"] for r in rows) == ["http://d.test/a", "http://d.test/b"]

    # replayed + new urls: the persisted per-url state suppresses the
    # already-seen ones across restarts
    _write_update_batch(
        spark, stream_in,
        [("http://d.test/a", "one again"), ("http://d.test/c", "three")],
    )
    run_pass()
    rows2 = spark.read.parquet(out_dir).collect()
    assert sorted(r["url"] for r in rows2) == [
        "http://d.test/a", "http://d.test/b", "http://d.test/c"
    ]


def test_first_seen_pick_spans_chunks():
    """The first-seen reducer must take the min-warc_ts row across ALL
    pandas chunks of a micro-batch group — an earlier-timestamp row in a
    LATER chunk must win (the pre-round-4 bug emitted the first chunk's
    min, making the result chunking-dependent)."""
    import pandas as pd

    from iscc_search_spark.streaming.ingest import _first_seen_pick

    mk = lambda ts, lang: pd.DataFrame(  # noqa: E731
        {"url": ["u"], "warc_ts": [pd.Timestamp(ts)], "lang": [lang]}
    )
    # earlier timestamp arrives in the SECOND chunk
    got = _first_seen_pick(iter([mk("2026-01-05", "en"), mk("2026-01-01", "de")]))
    assert str(got["warc_ts"].iloc[0]) == "2026-01-01 00:00:00"
    assert got["lang"].iloc[0] == "de"
    # equal timestamps: lang tie-break, independent of chunk order
    a = _first_seen_pick(iter([mk("2026-01-01", "en"), mk("2026-01-01", "de")]))
    b = _first_seen_pick(iter([mk("2026-01-01", "de"), mk("2026-01-01", "en")]))
    assert a["lang"].iloc[0] == b["lang"].iloc[0] == "de"
    # empty chunks are skipped; all-empty -> None
    assert _first_seen_pick(iter([mk("2026-01-01", "en").iloc[:0]])) is None
