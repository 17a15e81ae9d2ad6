"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (BM25 top-k over the sf0.001 documents
table).  ``queries()``/``oracle_sql()`` — one entry per implemented operator
from SURVEY.md §2, verified against DuckDB at sf=0.01 by the driver.
Implementations live in iscc_search_spark/entry_queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from iscc_search_spark.entry_queries import build_registry  # noqa: E402

_QUERIES, _ORACLES = build_registry()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _QUERIES["t1_bm25_topk_q1"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
