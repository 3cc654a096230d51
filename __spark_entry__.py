"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)    — flagship query smoke check on /root/testdata/sf0.001.
queries()       — operator inventory from SURVEY.md §2 + LLM-pipeline ops,
                  each (spark, sf_dir) -> DataFrame.
oracle_sql()    — DuckDB-equivalent ANSI SQL per query (same column names).

Implementations live in oxbow_spark.queries.registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from oxbow_spark.queries import oracle_sql_map, query_map  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H-Q1-style pricing summary at sf0.001."""
    from oxbow_spark.queries.registry import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return query_map()


def oracle_sql() -> dict[str, str]:
    return oracle_sql_map()
