"""Structured-Streaming ingest — the Spark form of the reference's
transparency-log aggregator (SURVEY.md §2.10, iscc_search/aggregator/).

Mapping:
- hub checkpoint cursor (poller.py:43-59)  -> checkpointLocation offsets
- bundle fetch + record decode (tlog.py)   -> file-source micro-batch
- record classification (entry.py:54-110)  -> classify_rows (S4)
- per-reason counters (poller.py:113-144)  -> _reasons parquet per batch (A9)
- at-least-once + idempotent upsert        -> append sink + dedupe-on-read
  (exactly-once per micro-batch via foreachBatch + deterministic file names
  is the Iceberg-MERGE path on a real deployment)

The batch build (operators/build.py) remains the source of truth; streamed
rows land in a raw area that the next incremental build run picks up —
matching the reference's poll-then-index loop.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iscc_search_spark.sources.pages import PAGES_SCHEMA, classify_rows, extract_pages


def stream_ingest(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    allowed_langs: list[str] | None = None,
    trigger_once: bool = True,
):
    """Stream pages parquet from ``input_dir``; write accepted rows to
    ``out_dir``/accepted and per-reason counters to ``out_dir``/_reasons.

    Returns the StreamingQuery (caller awaits/stops it).
    """
    src = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
    prepared = classify_rows(extract_pages(src), allowed_langs)

    accepted_dir = os.path.join(out_dir, "accepted")
    reasons_dir = os.path.join(out_dir, "_reasons")

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.persist()
        try:
            (
                batch_df.filter(F.col("reason") == "ok")
                .drop("reason", "html")
                .write.mode("append")
                .parquet(accepted_dir)
            )
            (
                batch_df.groupBy("reason")
                .agg(F.count("*").alias("n"))
                .withColumn("epoch", F.lit(epoch_id))
                .write.mode("append")
                .parquet(reasons_dir)
            )
        finally:
            batch_df.unpersist()

    writer = (
        prepared.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_ingest_stats(
    spark: SparkSession, input_dir: str, window: str = "1 hour"
) -> DataFrame:
    """Streaming windowed counts by lang with a watermark (late-data path).

    Returns a streaming DataFrame; drive with format('memory') in tests.
    """
    src = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
    return (
        src.withWatermark("warc_ts", "10 minutes")
        .groupBy(F.window("warc_ts", window), "lang")
        .agg(F.count("*").alias("n_pages"))
    )
