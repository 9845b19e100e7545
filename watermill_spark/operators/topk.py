"""Per-group top-k: the scalable idiom, factored as an operator."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_by: list[str],
    order_by: list[Column],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Keep the top k rows per group under a *total* order.

    Callers must make ``order_by`` a total order (append a unique key) or
    results are nondeterministic across runs/engines. One shuffle on the
    group key; Spark's WindowGroupLimit keeps only k rows per partition
    before the exchange, so the shuffle moves O(groups·k), not O(n).
    """
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    ranked = df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    if rank_col:
        return ranked.withColumnRenamed("_rn", rank_col)
    return ranked.drop("_rn")
