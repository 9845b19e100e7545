"""Declared analytics surface. Importing this package registers all queries."""

from . import (  # noqa: F401
    dedup,
    events,
    events2,
    extras,
    extras2,
    extras3,
    extras4,
    extras5,
    extras6,
    extras7,
    extras8,
    extras9,
    extras10,
    extras11,
    extras12,
    extras13,
    extras14,
    extras15,
    multimodal_q,
    similarity,
    text,
    tpch,
    tpch2,
    tpch3,
)
from .registry import REGISTRY, all_oracles, all_queries, bench_queries  # noqa: F401
