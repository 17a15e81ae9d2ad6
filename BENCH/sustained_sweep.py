"""Sustained-serving saturation sweep (round-5 tuning item).

The scaling harness's sustained leg overlapped a FIXED 3 batches from 3
driver threads; with a 32-shard scorer on 16 cores that may leave idle
slots between batch stages.  This sweep measures saturation q/s at one
pinned core count across (concurrency x batch-count x batch-size) to
pick the config the scaling run should use — the measurement is of the
HARNESS, not the engine, but it is the number the north rule reads.

Usage: taskset -c 0-15 python BENCH/sustained_sweep.py [n_docs] [cores]
Prints one JSON line per config plus a "best" line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from iscc_search_spark import corpus
    from iscc_search_spark.config import EngineConfig
    from iscc_search_spark.functions.textnorm import tok_tf_simhash_udf
    from iscc_search_spark.operators.build import build_index
    from iscc_search_spark.operators.wand import IndexReader, bm25_wand_topk_batch
    from iscc_search_spark.session import get_spark

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    work = tempfile.mkdtemp(prefix="sweep_")
    pages_path = os.path.join(work, "pages.parquet")
    corpus.write_pages(pages_path, n_docs, seed=42)

    spark = get_spark(app_name="sweep", cores=cores, shuffle_partitions=128)
    warm = spark.createDataFrame(
        [("warm up the workers",)] * (cores * 4), "text string"
    ).repartition(cores * 2)
    warm.select(tok_tf_simhash_udf("text")).count()
    pages = spark.read.parquet(pages_path)
    idx = os.path.join(work, "index")
    build_index(
        spark, pages, idx, cfg=EngineConfig(), n_parts=128, n_shards=32,
        group_size=128, resume=False, derived=False,
    )
    reader = IndexReader(spark, idx)
    all_queries = corpus.generate_queries(5000)
    bm25_wand_topk_batch(spark, reader, {0: all_queries[0]}, k=10).collect()

    results = []
    # total work per config is held ~constant at 15000 scored queries so
    # wall times are comparable; conc sweeps the overlap depth
    for batch_size in (5000, 2500):
        queries = dict(enumerate(all_queries[:batch_size]))
        for conc in (2, 3, 4, 6, 8):
            # n_batches >= conc, else the extra threads idle and the row
            # silently re-measures a shallower overlap
            n_batches = max(conc, 15000 // batch_size)

            def one_batch(_):
                bm25_wand_topk_batch(spark, reader, queries, k=10).collect()

            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                with ThreadPoolExecutor(conc) as ex:
                    list(ex.map(one_batch, range(n_batches)))
                best = min(best, time.time() - t0)
            qps = round(batch_size * n_batches / best, 1)
            row = {
                "batch_size": batch_size, "conc": conc,
                "n_batches": n_batches, "secs": round(best, 2), "qps": qps,
            }
            results.append(row)
            print(json.dumps(row), flush=True)

    best = max(results, key=lambda r: r["qps"])
    print(json.dumps({"best": best, "cores": cores, "n_docs": n_docs}))
    spark.stop()
    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
