"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query smoke check on sf0.001.
queries()    — every declared operator from SURVEY.md §2 (see
               watermill_spark/analytics/).
oracle_sql() — DuckDB-equivalent SQL per query; queries without an entry are
               non-SQL-expressible and get the rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from watermill_spark.analytics import all_oracles, all_queries
from watermill_spark.analytics.tpch import q01_pricing_summary


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q01_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
