"""Import shim: the example scripts are numbered for reading order
(`01_...py`), which isn't a legal module name — expose them as
`examples.example_01_router_dlq` etc. for the test suite."""

from __future__ import annotations

import importlib.util
import pathlib

_DIR = pathlib.Path(__file__).parent
_ALIASES = {
    "example_01_router_dlq": "01_router_dlq.py",
    "example_02_cqrs": "02_cqrs.py",
    "example_03_delayed_delivery": "03_delayed_delivery.py",
    "example_04_metrics": "04_metrics.py",
    "example_05_exactly_once_counter": "05_exactly_once_counter.py",
    "example_06_fanin_fanout": "06_fanin_fanout.py",
    "example_07_forwarder_outbox": "07_forwarder_outbox.py",
    "example_08_request_reply": "08_request_reply.py",
    "example_09_consumer_groups": "09_consumer_groups.py",
    "example_10_transactional_events": "10_transactional_events.py",
    "example_11_realtime_feed": "11_realtime_feed.py",
    "example_12_webhooks": "12_webhooks.py",
    "example_13_persistent_event_log": "13_persistent_event_log.py",
    "example_14_synchronizing_databases": "14_synchronizing_databases.py",
    "example_15_delayed_requeue": "15_delayed_requeue.py",
    "example_16_server_sent_events": "16_server_sent_events.py",
    "example_17_cqrs_ordered_events": "17_cqrs_ordered_events.py",
    "example_18_io_quickstart": "18_io_quickstart.py",
    "example_19_training_data_ingest": "19_training_data_ingest.py",
    "example_20_semantic_dedup_gate": "20_semantic_dedup_gate.py",
}


def __getattr__(name: str):
    fname = _ALIASES.get(name)
    if fname is None:
        raise AttributeError(name)
    spec = importlib.util.spec_from_file_location(f"examples.{name}", _DIR / fname)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    globals()[name] = mod
    return mod
