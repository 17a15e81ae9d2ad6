"""Sources (S1/S2/S4) + structured-streaming ingest (S3 analogue)."""

import os

import pytest
from pyspark.sql import functions as F

from iscc_search_spark.sources.pages import (
    classify_rows,
    extract_pages,
    read_pages_json,
)
from iscc_search_spark.streaming.ingest import stream_ingest


def test_classify_rows(spark):
    rows = [
        ("u1", "hello world", "en"),
        (None, "x", "en"),
        ("u3", None, "en"),
        ("u4", "   ", "en"),
        ("u5", "bonjour", "xx"),
    ]
    df = spark.createDataFrame(rows, "url string, text string, lang string")
    got = {
        r["url"]: r["reason"]
        for r in classify_rows(df, allowed_langs=["en"]).collect()
    }
    assert got["u1"] == "ok"
    assert got[None] == "malformed"
    assert got["u3"] == "malformed"
    assert got["u4"] == "empty"
    assert got["u5"] == "lang_mismatch"


def test_extract_pages_fills_missing_text(spark, pages_df):
    stripped = pages_df.withColumn(
        "text", F.when(F.col("url").endswith("/0"), F.lit(None)).otherwise(F.col("text"))
    )
    fixed = extract_pages(stripped)
    assert fixed.filter(F.col("text").isNull()).count() == 0
    # extraction reproduces the original text byte-identically
    orig = {r["url"]: r["text"] for r in pages_df.select("url", "text").collect()}
    got = {r["url"]: r["text"] for r in fixed.select("url", "text").collect()}
    assert got == orig


def test_read_pages_json(spark, tmp_path):
    p = str(tmp_path / "pages.jsonl")
    with open(p, "w") as f:
        f.write('{"url": "u1", "text": "hello", "lang": "en"}\n')
        f.write('{"url": "u2", "text": "world", "lang": "de"}\n')
    df = read_pages_json(spark, p)
    assert df.count() == 2
    assert set(df.columns) >= {"url", "text", "lang"}


def test_stream_ingest_counters_and_sink(spark, pages_path, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    indir = os.path.dirname(pages_path)
    q = stream_ingest(spark, indir, out, ckpt, allowed_langs=["en", "de", "fr"])
    q.awaitTermination(120)
    accepted = spark.read.parquet(os.path.join(out, "accepted"))
    reasons = spark.read.parquet(os.path.join(out, "_reasons"))
    total = spark.read.parquet(pages_path).count()
    ok = accepted.count()
    counted = {r["reason"]: r["n"] for r in reasons.groupBy("reason").agg(F.sum("n").alias("n")).collect()}
    assert counted.get("ok", 0) == ok
    assert sum(counted.values()) == total

    # restart with same checkpoint: no new batch -> no duplicate appends
    q2 = stream_ingest(spark, indir, out, ckpt, allowed_langs=["en", "de", "fr"])
    q2.awaitTermination(120)
    assert spark.read.parquet(os.path.join(out, "accepted")).count() == ok
