"""Declared analytics surface. Importing this package registers all queries."""

from . import dedup, events, similarity, text, tpch  # noqa: F401
from .registry import REGISTRY, all_oracles, all_queries, bench_queries  # noqa: F401
