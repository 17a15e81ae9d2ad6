"""Physical-plan audit: verify the plans we rely on at 100 TB actually
materialize — partition pruning on bucket dirs, parquet filter pushdown on
term, broadcast joins for small dims, whole-stage codegen on the relational
stages.  Prints the interesting `explain("formatted")` excerpts.

Usage: python tools/explain_audit.py [index_dir]
(builds a throwaway index if no dir given)
"""

from __future__ import annotations

import io
import os
import sys
import tempfile
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def check(name: str, plan: str, must_contain: list[str], must_not: list[str] = ()):
    ok = True
    for s in must_contain:
        if s not in plan:
            print(f"  MISSING [{name}]: {s!r}")
            ok = False
    for s in must_not:
        if s in plan:
            print(f"  UNEXPECTED [{name}]: {s!r}")
            ok = False
    print(f"  {'OK ' if ok else 'BAD'} {name}")
    return ok


def main():
    from pyspark.sql import functions as F

    from iscc_search_spark import corpus
    from iscc_search_spark.catalog import IndexCatalog
    from iscc_search_spark.config import EngineConfig
    from iscc_search_spark.operators.build import _bucket_of, build_index
    from iscc_search_spark.session import get_spark

    spark = get_spark(cores=8, shuffle_partitions=8)
    if len(sys.argv) > 1:
        idx = sys.argv[1]
    else:
        work = tempfile.mkdtemp(prefix="audit_")
        pp = os.path.join(work, "pages.parquet")
        corpus.write_pages(pp, 500)
        idx = os.path.join(work, "index")
        build_index(spark, spark.read.parquet(pp), idx, cfg=EngineConfig(),
                    n_parts=4, n_shards=4, group_size=4)
    cat = IndexCatalog(idx)
    meta = cat.read_meta()
    n_buckets = int(meta["term_buckets"])

    results = []

    # 1) posting scan: bucket dir pruning + term pushdown
    terms = ["t00001", "t00007"]
    buckets = sorted({_bucket_of(t, n_buckets) for t in terms})
    blocks = spark.read.parquet(cat.postings).filter(
        F.col("bucket").isin(buckets) & F.col("term").isin(terms)
    )
    p = plan_of(blocks)
    print("--- postings scan ---")
    results.append(check("bucket partition pruning", p, ["PartitionFilters"]))
    results.append(check("term pushed to parquet", p, ["PushedFilters: [In(term"]))

    # 2) docs lookup join after top-k must broadcast the k-row side
    docs = spark.read.parquet(cat.docs)
    topk = docs.select("doc_id").limit(10)
    j = topk.join(docs, "doc_id", "left")
    p = plan_of(j)
    print("--- topk enrichment join ---")
    results.append(check("broadcast join", p, ["BroadcastHashJoin"]))

    # 3) projection pruning: 2-col select reads 2-col schema
    two = spark.read.parquet(cat.docs).select("doc_id", "doc_len")
    p = plan_of(two)
    print("--- projection pruning ---")
    results.append(check("ReadSchema pruned", p, ["ReadSchema: struct<doc_id:bigint,doc_len:bigint>"]))

    # 4) tf aggregation stays in whole-stage codegen (partial agg before shuffle)
    from iscc_search_spark.operators.query import doc_term_tf

    docs2 = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    p = plan_of(doc_term_tf(docs2))
    print("--- tf aggregation ---")
    # map-side combine: partial_count must run BEFORE the Exchange (AQE hides
    # codegen ids until the final plan, so assert the partial agg instead)
    results.append(
        check("map-side partial agg", p, ["partial_count", "Exchange"])
    )

    print(f"\n{sum(results)}/{len(results)} plan checks passed")
    spark.stop()
    sys.exit(0 if all(results) else 1)


if __name__ == "__main__":
    main()
