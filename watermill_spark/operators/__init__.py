"""Reusable relational/stream operators beyond the Spark builtins.

Each operator here composes built-in DataFrame ops (option (a) of the
custom-operator ladder); none needs Python in the hot path except the
multimodal decode stubs which are Arrow-batched by design.
"""

from .joins import asof_join, range_join_binned
from .layout import read_bucketed, save_bucketed, save_partitioned, save_sorted
from .topk import topk_per_group
from .multimodal import (
    MEDIA_SCHEMA,
    decode_stub_batch,
    extract_features,
    frame_sample,
    media_df,
)

__all__ = [
    "asof_join",
    "range_join_binned",
    "topk_per_group",
    "MEDIA_SCHEMA",
    "media_df",
    "decode_stub_batch",
    "extract_features",
    "frame_sample",
]
