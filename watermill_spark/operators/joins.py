"""As-of and range joins — the two interval operators Spark lacks natively.

Both are implemented as compositions of built-in ops so Catalyst plans them
(no UDFs, no driver loops), chosen for their scale behavior:

- `asof_join`: union-scan formulation — O((n+m) log(n+m)) with ONE shuffle
  on the equi-key, independent of time-distance between matches. The naive
  alternative (range join + groupBy max) explodes quadratically in dense
  regions.
- `range_join_binned`: bin-and-verify for range joins *without* a selective
  equi-key — buckets the range dimension so the join has an equi-condition
  (bucket id) and the range predicate only verifies within neighboring
  buckets. Turns an O(n·m) cross into O(matches + n + m).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_on: str,
    right_on: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_on <= left_on`` within the same ``by`` group (backward as-of,
    ties resolved toward the greatest right row).

    Implementation: tag and union both sides, one window pass per ``by``
    group ordered by (time, side) carrying the running last right row
    forward, keep left rows. Right rows sort before left rows at equal
    timestamps, making the match inclusive.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (by, right_on)]
    l_tag = left.select(
        F.col(by).alias("_by"),
        F.col(left_on).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(F.col(right_on).alias("_t"), *[F.col(c) for c in right_cols]).alias("s"))
            .schema["s"].dataType
        ).alias("_r"),
    )
    r_tag = right.select(
        F.col(by).alias("_by"),
        F.col(right_on).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_tag.schema["_l"].dataType).alias("_l"),
        F.struct(F.col(right_on).alias("_t"), *[F.col(c) for c in right_cols]).alias("_r"),
    )
    both = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("_by")
        .orderBy("_ts", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = both.withColumn("_match", F.max(F.when(F.col("_is_left") == 0, F.col("_r"))).over(w))
    out = carried.filter(F.col("_is_left") == 1)
    sel = [F.col(f"_l.{c}").alias(c) for c in left.columns]
    sel += [F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in ["_t", *right_cols]]
    res = out.select(*sel)
    return res.withColumnRenamed(f"_t{suffix}", f"{right_on}{suffix}")


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_point: str | Column,
    right_point: str | Column,
    max_distance: float,
    extra_on: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join rows whose numeric points are within ``max_distance`` of each
    other, without requiring a selective equi-key.

    Bin-and-verify: both sides get ``floor(point / max_distance)`` bucket
    ids; the left side probes its own bucket and both neighbors (explode of
    3 ids — a candidate within distance d must fall in one of them); the
    equi-join on bucket id carries the shuffle; the exact |l-r| <= d
    predicate verifies. Join fan-out is bounded by true matches per bucket.
    """
    lp = F.col(left_point) if isinstance(left_point, str) else left_point
    rp = F.col(right_point) if isinstance(right_point, str) else right_point
    lb = left.withColumn(
        "_bins",
        F.explode(
            F.array(
                F.floor(lp / max_distance) - 1,
                F.floor(lp / max_distance),
                F.floor(lp / max_distance) + 1,
            )
        ),
    )
    rb = right.withColumn("_bin", F.floor(rp / max_distance))
    cond = (F.col("_bins") == F.col("_bin")) & (F.abs(lp - rp) <= max_distance)
    if extra_on is not None:
        cond = cond & extra_on
    out = lb.join(rb, cond, how)
    return out.drop("_bins", "_bin")
