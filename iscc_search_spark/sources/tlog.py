"""C2SP tlog-tiles wire format — the transparency-log ingest source (S3).

The reference's aggregator follows hub transparency logs by reading a
checkpoint, planning which entry bundles cover the unseen suffix, and
decoding each bundle's length-prefixed records
(iscc_search/aggregator/poller.py:62-86 plan, aggregator/tlog.py:42-107
wire decode).  This module re-implements that trust-mode subset of the
public tlog-tiles profile (https://c2sp.org/tlog-tiles) from the spec:

- checkpoint: three newline-terminated body lines (origin, decimal tree
  size, base64 root) followed by signature lines; we read the size only
  (the aggregator trusts the hub list + TLS, no proof verification);
- entry bundle: up to 256 records, each framed as a 2-byte big-endian
  length prefix + body, concatenated;
- paths: bundle index in thousands-grouped form (``1234067`` ->
  ``x001/x234/067``) under ``tile/entries/``, with ``.p/<width>`` for the
  in-progress partial bundle.

Byte-for-byte parity with the hub implementation is pinned by the
Go-generated known-answer vectors (tests/data/tlog_kat.json).

The Spark hand-off: ``records_df`` turns fetched (index, width, bytes)
bundles into a (leaf_index, record) DataFrame — the micro-batch the
streaming ingest / index-maintenance sink consumes.  Transport (HTTP
GETs of checkpoint + bundles) stays with the caller: the decode layer is
Sans-IO, so it drops into foreachBatch, a custom data source, or a bulk
backfill job unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TILE_RECORDS = 256  # fixed by the tlog-tiles profile (tile height 8)


def checkpoint_tree_size(text: str) -> int:
    """Committed tree size from a C2SP checkpoint (no signature check).

    Line 2 of the body is the decimal size; canonical form is enforced
    (no sign, no leading zeros) so a hub cannot serve two encodings of
    the same size."""
    lines = text.split("\n")
    if len(lines) < 3:
        raise ValueError("checkpoint body has too few lines")
    size_str = lines[1]
    if not size_str.isdigit():  # rejects '', '-1', '+1', 'five'
        raise ValueError(f"checkpoint tree size is not a canonical integer: {size_str!r}")
    if size_str != "0" and size_str[0] == "0":
        raise ValueError(f"checkpoint tree size has leading zeros: {size_str!r}")
    return int(size_str)


def decode_entry_bundle(data: bytes) -> list[bytes]:
    """Record byte strings, in leaf order, from entry-bundle framing
    (2-byte big-endian length prefix per record, no trailing length)."""
    view = memoryview(data)
    out: list[bytes] = []
    pos, end = 0, len(view)
    while pos < end:
        if end - pos < 2:
            raise ValueError("entry bundle truncated in length prefix")
        n = int.from_bytes(view[pos : pos + 2], "big")
        pos += 2
        if end - pos < n:
            raise ValueError("entry bundle truncated in record body")
        out.append(bytes(view[pos : pos + n]))
        pos += n
    return out


def tile_index_path(n: int) -> str:
    """Thousands-grouped path form of a tile/bundle index: groups of
    three digits from the least-significant end, all but the last
    ``x``-prefixed (``1234067`` -> ``x001/x234/067``)."""
    groups = [f"{n % 1000:03d}"]
    n //= 1000
    while n:
        groups.append(f"x{n % 1000:03d}")
        n //= 1000
    return "/".join(reversed(groups))


def entry_bundle_path(index: int, width: int = 0) -> str:
    """``tile/entries/<N>`` for a full bundle, ``...<N>.p/<W>`` for the
    in-progress partial holding W records."""
    base = f"tile/entries/{tile_index_path(index)}"
    return f"{base}.p/{width}" if width else base


def fetch_plan(cursor: int, tree_size: int) -> list[tuple[int, int]]:
    """(bundle_index, width) fetches covering records [cursor, tree_size)
    — width 0 is a full bundle, width>0 the partial form.  Empty when the
    tree has not grown (a regression is the caller's re-backfill case)."""
    if tree_size <= cursor:
        return []
    lo = cursor // TILE_RECORDS
    hi = (tree_size - 1) // TILE_RECORDS
    plan = []
    for idx in range(lo, hi + 1):
        full_end = (idx + 1) * TILE_RECORDS
        plan.append((idx, 0) if full_end <= tree_size else (idx, tree_size - idx * TILE_RECORDS))
    return plan


def records_df(
    spark: SparkSession,
    bundles: list[tuple[int, int, bytes]],
    cursor: int = 0,
) -> DataFrame:
    """(leaf_index, record) rows from fetched bundles, skipping leaves
    below ``cursor`` (the already-ingested prefix of the first bundle) —
    the DataFrame a foreachBatch maintenance sink upserts from.

    Each bundle is validated against its plan width (a short bundle is a
    truncated fetch, surfaced loudly like the reference's poll loop,
    poller.py:128-131)."""
    rows = []
    for idx, width, data in bundles:
        records = decode_entry_bundle(data)
        expected = width or TILE_RECORDS
        if len(records) != expected:
            raise ValueError(
                f"bundle {idx} has {len(records)} records, expected {expected}"
            )
        start = idx * TILE_RECORDS
        for i, rec in enumerate(records):
            leaf = start + i
            if leaf >= cursor:
                rows.append((leaf, bytearray(rec)))
    return spark.createDataFrame(rows, "leaf_index long, record binary")
