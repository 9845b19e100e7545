"""Declared analytics surface. Importing this package registers all queries."""

from . import dedup, events, events2, similarity, text, tpch, tpch2, tpch3  # noqa: F401
from .registry import REGISTRY, all_oracles, all_queries, bench_queries  # noqa: F401
