"""Raw-SQL query surface: register the testdata tables as temp views and
run ANSI SQL through Spark — the `spark.sql` face of the same engine, so
users can bring SQL instead of the DataFrame API (SURVEY.md §2.B: the
declarative plan is the IR either way; Catalyst sees identical logical
plans from both).

``register_views`` routes every table through :func:`registry.load`, so
the events timestamp normalization and relation caching apply to SQL users
too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from watermill_spark.session import tune_session

from .registry import TABLES, load


def register_views(
    spark: SparkSession, sf_dir: str, prefix: str = ""
) -> list[str]:
    """Create/replace one temp view per testdata table; returns the view
    names. Views are session-scoped (temp), so concurrent sessions with
    different sf_dirs don't collide."""
    tune_session(spark)
    names = []
    for t in TABLES:
        name = f"{prefix}{t}"
        load(spark, sf_dir, t).createOrReplaceTempView(name)
        names.append(name)
    return names


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run a SQL query against the registered testdata views (registering
    them first). The result is a plain DataFrame — compose it with the
    DataFrame surface freely."""
    register_views(spark, sf_dir)
    return spark.sql(query)
