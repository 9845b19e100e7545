"""Higher-level components (SURVEY.md §2.A #24-29, #35-41)."""

from .fan import FanIn, FanOut
from .forwarder import Forwarder, envelope_unwrap, envelope_wrap
from .delay import delay_for, delay_until, DelayPublisher, deliverable_now
from .requeuer import Requeuer

__all__ = [
    "FanIn",
    "FanOut",
    "Forwarder",
    "envelope_wrap",
    "envelope_unwrap",
    "delay_for",
    "delay_until",
    "DelayPublisher",
    "deliverable_now",
    "Requeuer",
]
from .requestreply import (  # noqa: F401
    await_reply,
    new_operation_id,
    replying,
    send_with_reply,
)
