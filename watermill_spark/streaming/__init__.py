"""Routing + middleware + streaming execution (SURVEY.md §2.A, §3.1)."""

from .router import Router, RouterConfig
from . import middleware
from .plugins import signals_handler

__all__ = ["Router", "RouterConfig", "middleware", "signals_handler"]
