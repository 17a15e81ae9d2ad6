"""spark-submit entry points: build / search / stats.

Cluster usage (north rule: ``spark-submit --py-files`` on multi-executor
clusters)::

    zip -r iscc_search_spark.zip iscc_search_spark
    echo 'from iscc_search_spark.cli import main; import sys; sys.exit(main())' > job.py
    spark-submit --py-files iscc_search_spark.zip job.py \
        build --pages s3://bucket/pages/ --index s3://bucket/index/

(spark-submit takes a script file, not ``-m``; tests/test_spark_submit.py
drives this exact packaging end-to-end against a real spark-submit.)

Local sandbox: ``python -m iscc_search_spark.cli build --pages p.parquet
--index /tmp/idx``.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="iscc-search-spark")
    p.add_argument("--cores", type=int, default=None, help="local[N] threads")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build (or resume) an index")
    b.add_argument("--pages", required=True, help="pages parquet path")
    b.add_argument("--index", required=True, help="index output dir")
    b.add_argument("--parts", type=int, default=32)
    b.add_argument("--shards", type=int, default=32)
    b.add_argument("--group-size", type=int, default=8)
    b.add_argument("--no-resume", action="store_true")

    s = sub.add_parser("search", help="BM25 top-k query")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--no-metadata", action="store_true")

    st = sub.add_parser("stats", help="index statistics")
    st.add_argument("--index", required=True)

    nd = sub.add_parser("neardup", help="simhash near-duplicate pairs")
    nd.add_argument("--index", required=True)
    nd.add_argument("--max-hamming", type=int, default=6)

    ix = sub.add_parser("indexes", help="named-index registry (S8 full)")
    ix.add_argument("--root", required=True, help="registry base dir")
    ix.add_argument(
        "action", choices=["create", "list", "get", "delete", "add"],
    )
    ix.add_argument("name", nargs="?", help="index name (not for 'list')")
    ix.add_argument("--pages", help="pages parquet path (for 'add')")

    ag = sub.add_parser(
        "aggregate",
        help="poll hub transparency logs into a named index (S3 loop)",
    )
    ag.add_argument("--root", required=True, help="registry base dir")
    ag.add_argument("--index", default="idp", help="aggregator index name")
    ag.add_argument("--hub-list", required=True, help="hub list YAML url/path")
    ag.add_argument("--network", default="mainnet")
    ag.add_argument("--poll-interval", type=float, default=30.0)
    ag.add_argument(
        "--once", action="store_true",
        help="one poll cycle then exit (cron-style; default: loop forever)",
    )
    ag.add_argument(
        "--serve", action="store_true",
        help="also serve /status + read-only registry routes (aggregator mode)",
    )
    ag.add_argument("--port", type=int, default=8080)

    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from iscc_search_spark.session import get_spark

    pre_existing = SparkSession.getActiveSession() is not None
    spark = get_spark(app_name=f"iscc-search-{args.cmd}", cores=args.cores)
    try:
        if args.cmd == "build":
            from iscc_search_spark.operators.build import build_index

            pages = spark.read.parquet(args.pages)
            res = build_index(
                spark,
                pages,
                args.index,
                n_parts=args.parts,
                n_shards=args.shards,
                group_size=args.group_size,
                resume=not args.no_resume,
            )
            print(
                json.dumps(
                    {
                        "n_docs": res.n_docs,
                        "avgdl": res.avgdl,
                        "parts_built": res.parts_built,
                        "parts_skipped": res.parts_skipped,
                        "secs": round(res.secs, 2),
                        "docs_per_sec": round(res.n_docs / res.secs, 1)
                        if res.secs
                        else None,
                    }
                )
            )
        elif args.cmd == "search":
            from iscc_search_spark.plans.search import SearchIndex

            idx = SearchIndex(spark, args.index)
            rows = idx.search(
                args.query, k=args.k, with_metadata=not args.no_metadata
            ).collect()
            for r in rows:
                print(json.dumps(r.asDict(), default=str))
        elif args.cmd == "stats":
            from iscc_search_spark.plans.search import SearchIndex

            print(json.dumps(SearchIndex(spark, args.index).stats(), default=str))
        elif args.cmd == "neardup":
            from iscc_search_spark.plans.search import SearchIndex

            idx = SearchIndex(spark, args.index)
            for r in idx.near_duplicates(args.max_hamming).collect():
                print(json.dumps(r.asDict()))
        elif args.cmd == "indexes":
            from iscc_search_spark.manager import IndexManager

            mgr = IndexManager(spark, args.root)
            if args.action == "list":
                print(json.dumps(mgr.list_indexes()))
            elif args.action == "create":
                print(json.dumps(mgr.create_index(args.name)))
            elif args.action == "get":
                print(json.dumps(mgr.get_index(args.name)))
            elif args.action == "delete":
                mgr.delete_index(args.name)
                print(json.dumps({"deleted": args.name}))
            elif args.action == "add":
                pages = spark.read.parquet(args.pages)
                print(json.dumps(mgr.add_assets(args.name, pages)))
        elif args.cmd == "aggregate":
            from iscc_search_spark.aggregator import Poller
            from iscc_search_spark.manager import IndexManager

            mgr = IndexManager(spark, args.root)
            poller = Poller(
                mgr, args.index, args.hub_list, network=args.network,
                poll_interval=args.poll_interval,
            )
            srv = None
            if args.serve:
                from iscc_search_spark.server import serve_in_thread

                srv, base = serve_in_thread(
                    spark, base_path=args.root, port=args.port,
                    aggregator_mode=True, aggregator_index=args.index,
                    poller=poller,
                )
                print(json.dumps({"serving": base}), flush=True)
            try:
                if args.once:
                    poller.poll_cycle()
                    print(json.dumps({"hubs": poller.status_rows()}, default=str))
                else:
                    poller.run()
            except KeyboardInterrupt:
                poller.stop()
            finally:
                if srv is not None:
                    srv.shutdown()
    finally:
        if not pre_existing:  # embedded callers keep their session
            spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
