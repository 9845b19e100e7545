"""Data-layout operators: the write-side half of 100-TB read performance.

Layout decisions (bucketing, sort order, partition columns) are made once at
ingest and pay off on every subsequent query:

- `save_bucketed`: hash-bucket + sort by join key → co-located sort-merge
  joins with ZERO exchange forever after (verified in
  tests/test_scale_plans.py::test_bucketed_join_has_no_shuffle).
- `save_sorted`: range-partition + sort within files → row-group min/max
  stats (zone maps) make selective range predicates skip whole files.
- `save_partitioned`: directory partitioning on a low-cardinality column →
  partition pruning removes directories before any I/O.

No watermill analog (the reference delegates storage layout to brokers);
this is [NS] surface from SURVEY.md §2.B's scan/sink row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame, table: str, keys: list[str], n_buckets: int = 64
) -> None:
    """Persist hash-bucketed + per-bucket-sorted on `keys` (saveAsTable —
    bucketing metadata lives in the catalog).

    Two tables bucketed identically on their join key sort-merge join with
    no Exchange — the bucket layout IS the shuffle, performed once at write.
    Pick `n_buckets` so a bucket of the LARGER table fits an executor core's
    working set at full scale (e.g. 100 TB / 64k buckets ≈ 1.6 GB).
    """
    (
        df.write.bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def save_sorted(df: DataFrame, path: str, order: list[str], n_files: int | None = None) -> None:
    """Persist range-partitioned and sorted by `order` columns.

    Parquet writers record per-row-group min/max for sorted columns; a
    selective range filter then skips entire files/row groups (zone-map
    pruning) — `PushedFilters` stays the same, the I/O drops. Range
    partitioning also gives globally sorted output files (the layout
    `ORDER BY`-heavy consumers want).
    """
    ranged = (
        df.repartitionByRange(n_files, *order)
        if n_files
        else df.repartitionByRange(*order)
    )
    ranged.sortWithinPartitions(*order).write.mode("overwrite").parquet(path)


def save_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Persist directory-partitioned on low-cardinality columns.

    Queries filtering on a partition column prune directories at planning
    time (`PartitionFilters` in `.explain`) — zero I/O for excluded
    partitions. Keep cardinality modest (≤ thousands of directories): the
    small-files trade-off is real, and high-cardinality keys belong in
    bucketing instead.
    """
    df.write.partitionBy(*partition_cols).mode("overwrite").parquet(path)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket metadata intact (must go
    through the catalog — a plain path read loses bucketing)."""
    return spark.table(table)
