"""Routing + middleware + streaming execution (SURVEY.md §2.A, §3.1)."""

from .router import HandlerHandle, Router, RouterConfig
from . import middleware
from .plugins import signals_handler

__all__ = ["Router", "RouterConfig", "HandlerHandle", "middleware", "signals_handler"]
