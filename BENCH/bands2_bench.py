"""Micro-bench of the combo2 (simprint_bands2) table write — the one
stage whose single-box N->4N scaling measured weak in round 5 (volume-
bound: 91 rows/segment through the parquet writer on one shared memory
bus).  Isolates the write and compares encoder knobs that do not change
the lookup semantics:

  * codec: session zstd (current) vs snappy vs uncompressed — zstd's
    encode CPU on 91x-repeated RLE-friendly runs may dominate;
  * key width: long (current) vs int — the two-band combo key is <= ~20
    bits, so int halves the raw bytes of the ONLY non-RLE column.

NOTE (round-6 correction, was an ADVICE item): the reader does NOT cast
key on read — switching the persisted key width is a table-layout change
and requires a FORMAT_VERSION bump plus a full rebuild, exactly like the
format-5 slim-schema change (hash limbs dropped from this table).  The
int-key variant below prices the bytes only; do not ship it without the
version bump.

Usage: python BENCH/bands2_bench.py [pages.parquet] [workdir] [cores]
Prints one JSON line per variant: {variant, secs(min of 2), bytes}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    pages_path = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1/pages.parquet"
    work = sys.argv[2] if len(sys.argv) > 2 else "/dev/shm/bands2_bench"
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from iscc_search_spark.config import EngineConfig
    from iscc_search_spark.operators.build import SEG_BANDS2, IndexCatalog, build_index
    from iscc_search_spark.operators.simprints import (
        SIMPRINT_BITS,
        _band_combos,
        band_key128_expr,
        band_widths,
    )
    from iscc_search_spark.session import get_spark

    spark = get_spark(app_name="bands2-bench", cores=cores, shuffle_partitions=128)
    idx = os.path.join(work, "index")
    cat = IndexCatalog(idx)
    if not os.path.isdir(cat.simprints):
        pages = spark.read.parquet(pages_path)
        build_index(spark, pages, idx, cfg=EngineConfig(), resume=False,
                    derived=True, combo2=False)

    # mirror build_derived's input shape: docs scan -> segs explode
    docs = spark.read.parquet(cat.docs)
    sp = docs.select("part", "doc_id", F.explode("segs").alias("s")).select(
        "part", "doc_id",
        F.col("s.seg_idx").alias("seg_idx"),
        F.col("s.simhash").alias("simhash"),
        F.col("s.sh_lo").alias("sh_lo"),
    )
    widths2 = band_widths(SEG_BANDS2, SIMPRINT_BITS)
    base2 = sp
    for i, (shift, w) in enumerate(widths2):
        base2 = base2.withColumn(f"_b{i}", band_key128_expr("simhash", "sh_lo", shift, w))
    combo_keys = [
        F.shiftleft(F.col(f"_b{i}"), widths2[j][1]).bitwiseOR(F.col(f"_b{j}"))
        for (i, j) in _band_combos(SEG_BANDS2, 2)
    ]

    def sb2(key_type: str):
        df = base2.select(
            "part", "doc_id", "seg_idx", "simhash", "sh_lo",
            F.posexplode(F.array(*combo_keys)).alias("band", "key"),
        )
        key = F.col("key").cast(key_type) if key_type != "long" else F.col("key")
        return df.select(
            "part", "doc_id", "seg_idx", "simhash", "sh_lo",
            F.col("band").cast("int").alias("band"), key.alias("key"),
        )

    variants = [
        ("zstd_long", "zstd", "long"),
        ("snappy_long", "snappy", "long"),
        ("zstd_int", "zstd", "int"),
        ("snappy_int", "snappy", "int"),
        ("uncompressed_int", "uncompressed", "int"),
    ]
    out = os.path.join(work, "sb2_out")
    for name, codec, key_type in variants:
        secs = float("inf")
        for _ in range(2):
            shutil.rmtree(out, ignore_errors=True)
            t0 = time.time()
            (
                sb2(key_type).write.mode("overwrite")
                .option("compression", codec)
                .partitionBy("part")
                .parquet(out)
            )
            secs = min(secs, time.time() - t0)
        print(json.dumps({"variant": name, "secs": round(secs, 2),
                          "mb": round(dir_bytes(out) / 1e6, 1)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
