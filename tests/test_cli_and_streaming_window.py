"""CLI entry points (S8/serving surface) and streaming windowed stats."""

import json
import os

from iscc_search_spark import corpus as corpus_mod


def test_cli_build_search_stats(tmp_path, capsys, spark):
    # spark fixture keeps the session warm; cli reuses it via getOrCreate
    from iscc_search_spark.cli import main

    pages = str(tmp_path / "pages.parquet")
    corpus_mod.write_pages(pages, 120, seed=42)
    idx = str(tmp_path / "idx")

    assert main(["build", "--pages", pages, "--index", idx,
                 "--parts", "4", "--shards", "2", "--group-size", "4"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_docs"] == 120 and out["docs_per_sec"] > 0

    assert main(["search", "--index", idx, "--query", "t00001 t00002", "-k", "3"]) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert 0 < len(lines) <= 3
    assert lines[0]["rank"] == 1 and "url" in lines[0]

    assert main(["stats", "--index", idx]) == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["n_docs"] == 120

    # resume no-op: rebuild skips every partition
    assert main(["build", "--pages", pages, "--index", idx,
                 "--parts", "4", "--shards", "2"]) == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["parts_built"] == [] and len(out2["parts_skipped"]) == 4


def test_windowed_ingest_stats(spark, pages_path):
    from iscc_search_spark.streaming.ingest import windowed_ingest_stats

    agg = windowed_ingest_stats(spark, os.path.dirname(pages_path), window="1 hour")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_stats")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM win_stats").collect()
    assert rows
    total = sum(r["n_pages"] for r in rows)
    assert total == 200  # all corpus rows counted once
    langs = {r["lang"] for r in rows}
    assert "en" in langs
