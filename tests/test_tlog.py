"""tlog-tiles wire decode vs the Go-generated known-answer vectors.

tests/data/tlog_kat.json carries the hub project's KAT for the public
C2SP tlog-tiles profile (record format ``iscc-log-entry-<i>``); parity
here proves the Spark aggregator source decodes the same bytes the
reference's poller does (aggregator/tlog.py:42-107, poller.py:62-86)."""

from __future__ import annotations

import json
import os

import pytest

from iscc_search_spark.sources.tlog import (
    TILE_RECORDS,
    checkpoint_tree_size,
    decode_entry_bundle,
    entry_bundle_path,
    fetch_plan,
    records_df,
    tile_index_path,
)

KAT = json.load(
    open(os.path.join(os.path.dirname(__file__), "data", "tlog_kat.json"))
)


def test_checkpoint_parsing():
    signed = (
        "sb0.iscc.id\n12345\nq83vASNFZ4mrze8BI0Vn\n\n"
        "— sb0.iscc.id c2lnbmF0dXJl\n"
    )
    assert checkpoint_tree_size(signed) == 12345
    assert checkpoint_tree_size("origin\n0\nroot\n") == 0
    for bad in ("origin\n5", "origin\nfive\nroot\n", "origin\n01\nroot\n",
                "origin\n-1\nroot\n", "origin\n+1\nroot\n"):
        with pytest.raises(ValueError):
            checkpoint_tree_size(bad)


def test_bundle_decode_roundtrip_and_truncation():
    recs = [b"a", b"bb" * 100, b"", b"record"]
    framed = b"".join(len(r).to_bytes(2, "big") + r for r in recs)
    assert decode_entry_bundle(framed) == recs
    assert decode_entry_bundle(b"") == []
    with pytest.raises(ValueError, match="length prefix"):
        decode_entry_bundle(b"\x00")
    with pytest.raises(ValueError, match="record body"):
        decode_entry_bundle(b"\x00\x05abc")


def test_paths():
    assert tile_index_path(0) == "000"
    assert tile_index_path(999) == "999"
    assert tile_index_path(1000) == "x001/000"
    assert tile_index_path(1234067) == "x001/x234/067"
    assert entry_bundle_path(0) == "tile/entries/000"
    assert entry_bundle_path(1, width=1) == "tile/entries/001.p/1"
    assert entry_bundle_path(273, width=112) == "tile/entries/273.p/112"


def test_fetch_plan_edges():
    assert fetch_plan(5, 5) == []
    assert fetch_plan(10, 3) == []  # regression -> caller re-backfills
    assert fetch_plan(0, 1) == [(0, 1)]
    assert fetch_plan(0, 256) == [(0, 0)]
    assert fetch_plan(0, 257) == [(0, 0), (1, 1)]
    assert fetch_plan(256, 257) == [(1, 1)]
    assert fetch_plan(100, 600) == [(0, 0), (1, 0), (2, 88)]


def test_kat_entry_bundles_byte_exact():
    """fetch_plan + entry_bundle_path + decode_entry_bundle reproduce the
    Go-generated vectors byte-exactly (the reference's own parity gate,
    tests/test_aggregator_tlog.py:92-112)."""
    for size_str, bundles in KAT["entry_bundles"].items():
        tree_size = int(size_str)
        plan = fetch_plan(0, tree_size)
        planned = {entry_bundle_path(i, w): (i, w) for i, w in plan}
        if tree_size <= 2 * TILE_RECORDS:
            assert sorted(planned) == sorted(bundles)
        else:
            assert set(bundles) <= set(planned)
        for path, data_hex in bundles.items():
            idx, width = planned[path]
            records = decode_entry_bundle(bytes.fromhex(data_hex))
            start = idx * TILE_RECORDS
            expected = width or min(TILE_RECORDS, tree_size - start)
            assert len(records) == expected
            assert records == [
                f"iscc-log-entry-{start + i}".encode() for i in range(expected)
            ]


def test_records_df_feeds_spark(spark):
    """Decoded bundles become the (leaf_index, record) micro-batch with
    the already-ingested prefix skipped and short bundles rejected."""
    kat7 = KAT["entry_bundles"]["70000"]
    fetched = []
    for path, data_hex in kat7.items():
        # recover (idx, width) from the KAT path via the plan
        planned = {entry_bundle_path(i, w): (i, w) for i, w in fetch_plan(0, 70000)}
        idx, width = planned[path]
        fetched.append((idx, width, bytes.fromhex(data_hex)))
    fetched.sort()
    df = records_df(spark, fetched, cursor=0)
    rows = {r["leaf_index"]: bytes(r["record"]) for r in df.collect()}
    assert rows[0] == b"iscc-log-entry-0"
    some = max(rows)
    assert rows[some] == f"iscc-log-entry-{some}".encode()

    # cursor skips the already-processed prefix of the first bundle
    df2 = records_df(spark, fetched, cursor=100)
    assert df2.agg({"leaf_index": "min"}).collect()[0][0] == 100

    # short bundle -> loud failure (truncated fetch must not ingest):
    # re-frame only the first 10 records of a full bundle
    idx0, _, data0 = fetched[0]
    short = b"".join(
        len(r).to_bytes(2, "big") + r for r in decode_entry_bundle(data0)[:10]
    )
    with pytest.raises(ValueError, match="expected"):
        records_df(spark, [(idx0, 0, short)], 0)
    # and a byte-level truncation fails in the decoder itself
    with pytest.raises(ValueError, match="truncated"):
        records_df(spark, [(idx0, 0, data0[:-3])], 0)


def test_records_feed_index_maintenance(spark, tmp_path):
    """Composition: fetch plan -> bundle decode -> records_df -> url-keyed
    upsert into a live named index (the aggregator's poll-then-index loop,
    poller.py:113-144, over the Spark maintenance path)."""
    from pyspark.sql import functions as F

    from iscc_search_spark.manager import IndexManager

    # synthesize one full bundle + one partial, records = page payloads
    def frame(recs):
        return b"".join(len(r).to_bytes(2, "big") + r for r in recs)

    def rec(i):
        return f"http://log.test/{i}\ttlog record body {i} qqtlog".encode()

    full = frame([rec(i) for i in range(TILE_RECORDS)])
    part = frame([rec(TILE_RECORDS + i) for i in range(3)])
    plan = fetch_plan(0, TILE_RECORDS + 3)
    assert plan == [(0, 0), (1, 3)]
    df = records_df(spark, [(0, 0, full), (1, 3, part)], cursor=0)
    pages = df.select(
        F.split(F.decode("record", "UTF-8"), "\t").getItem(0).alias("url"),
        F.split(F.decode("record", "UTF-8"), "\t").getItem(1).alias("text"),
        F.lit("und").alias("lang"),
    )
    mgr = IndexManager(spark, str(tmp_path / "root"), n_parts=4, n_shards=4)
    mgr.create_index("agg")
    info = mgr.add_assets("agg", pages)
    assert info["assets"] == TILE_RECORDS + 3
    ix = mgr.open("agg")
    hits = ix.search("qqtlog", k=5, with_metadata=False).collect()
    assert len(hits) == 5
