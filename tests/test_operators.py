"""Operator unit tests: as-of join, binned range join, top-k, multimodal."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from watermill_spark.operators import (
    asof_join,
    extract_features,
    frame_sample,
    media_df,
    range_join_binned,
    topk_per_group,
)


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_join_backward_semantics(spark):
    quotes = spark.createDataFrame(
        [("A", _ts(0), 10.0), ("A", _ts(5), 11.0), ("B", _ts(3), 20.0)],
        ["sym", "qts", "price"],
    )
    trades = spark.createDataFrame(
        [("A", _ts(4), 1), ("A", _ts(5), 2), ("A", _ts(9), 3),
         ("B", _ts(1), 4), ("B", _ts(7), 5)],
        ["sym", "tts", "qty"],
    )
    j = asof_join(trades, quotes, by="sym", left_on="tts", right_on="qts",
                  right_cols=["price"])
    got = {r["qty"]: (r["price_asof"], r["qts_asof"]) for r in j.collect()}
    assert got[1] == (10.0, _ts(0))   # latest quote <= t4 is t0
    assert got[2] == (11.0, _ts(5))   # equal timestamps are inclusive
    assert got[3] == (11.0, _ts(5))
    assert got[4] == (None, None)     # no quote before t1 for B
    assert got[5] == (20.0, _ts(3))


def test_asof_join_tie_takes_greatest_right(spark):
    left = spark.createDataFrame([("k", 10, 1)], ["g", "t", "lid"])
    right = spark.createDataFrame([("k", 10, 7), ("k", 10, 9)], ["g", "t", "rid"])
    j = asof_join(left, right, by="g", left_on="t", right_on="t", right_cols=["rid"])
    assert j.head()["rid_asof"] == 9


def test_range_join_binned_matches_naive(spark):
    import random

    rnd = random.Random(42)
    left = spark.createDataFrame(
        [(i, rnd.uniform(0, 100)) for i in range(200)], ["lid", "lx"]
    )
    right = spark.createDataFrame(
        [(i, rnd.uniform(0, 100)) for i in range(200)], ["rid", "rx"]
    )
    d = 1.5
    binned = {
        (r["lid"], r["rid"])
        for r in range_join_binned(left, right, "lx", "rx", d).collect()
    }
    naive = {
        (r["lid"], r["rid"])
        for r in left.join(right, F.abs(F.col("lx") - F.col("rx")) <= d).collect()
    }
    assert binned == naive
    assert len(binned) > 0


def test_topk_per_group_total_order(spark):
    df = spark.createDataFrame(
        [("g1", 5, "a"), ("g1", 5, "b"), ("g1", 3, "c"), ("g2", 9, "d")],
        ["g", "score", "id"],
    )
    top = topk_per_group(df, ["g"], [F.desc("score"), F.asc("id")], k=2, rank_col="r")
    got = {(r["g"], r["r"]): r["id"] for r in top.collect()}
    assert got == {("g1", 1): "a", ("g1", 2): "b", ("g2", 1): "d"}


@pytest.fixture
def media(spark):
    items = [
        (1, "image", b"fake-jpeg-bytes-1"),
        (2, "image", b"fake-jpeg-bytes-2"),
        (3, "audio", b"fake-wav-bytes"),
        (4, "video", b"fake-mp4-bytes"),
        (5, "video", b"fake-mp4-bytes"),  # identical content to 4
    ]
    return media_df(spark, items)


def test_multimodal_feature_extraction(spark, media):
    feats = extract_features(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    # images/videos get dimensions; audio does not
    assert rows[1]["width"] is not None and rows[1]["height"] is not None
    assert rows[3]["width"] is None
    assert rows[4]["n_frames"] >= 8
    # identical payload ⇒ identical content hash (exact-dup detection works
    # on media exactly like on text)
    assert rows[4]["content_sha"] == rows[5]["content_sha"]
    assert rows[1]["content_sha"] != rows[2]["content_sha"]
    # deterministic stub: re-extraction yields identical features
    again = {r["media_id"]: r for r in extract_features(media).collect()}
    assert again[4]["n_frames"] == rows[4]["n_frames"]


def test_multimodal_frame_sampling(spark, media):
    sampled = frame_sample(media, every_n=4)
    rows = sampled.collect()
    assert all(r["frame_idx"] % 4 == 0 for r in rows)
    per_vid = {}
    for r in rows:
        per_vid.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert set(per_vid) == {4, 5}
    feats = {r["media_id"]: r["n_frames"] for r in extract_features(media).collect()}
    for vid, idxs in per_vid.items():
        assert len(idxs) == (feats[vid] + 3) // 4


def test_multimodal_metadata_stays_jvm_side(spark, media):
    """Metadata-only transforms never enter Python: the plan for a mime
    filter + meta projection contains no Python/Arrow eval node."""
    plan = (
        media.filter(F.col("kind") == "image")
        .select("media_id", "mime", F.element_at("meta", "src").alias("src"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "MapInPandas" not in plan


def test_sql_interface_matches_dataframe_surface(spark):
    """sqlapi: raw ANSI SQL over registered views plans/executes through the
    same engine — results match the DataFrame API bit-for-bit."""
    from pyspark.sql import functions as F

    from watermill_spark.analytics.registry import load
    from watermill_spark.analytics.sqlapi import register_views, sql

    sf = "/root/testdata/sf0.001"
    views = register_views(spark, sf)
    assert "lineitem" in views and "events" in views

    got = sql(
        spark,
        sf,
        """
        SELECT l_returnflag, COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
    ).collect()
    want = (
        load(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,6)"))
            .cast("double")
            .alias("qty"),
        )
        .orderBy("l_returnflag")
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]

    # events views get the same ts normalization as the DataFrame path
    hours = sql(
        spark, sf, "SELECT COUNT(DISTINCT date_trunc('hour', ts)) AS h FROM events"
    ).collect()[0]["h"]
    assert hours > 0
