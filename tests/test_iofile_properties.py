"""Property-based NDJSON line-codec tests (hypothesis): the io-transport
wire format round-trips arbitrary payload bytes, metadata maps, uuids, and
topic strings, and never breaks line framing (no embedded newlines in the
marshaled form) — the invariants every consumer of a topic file relies on.

Complements tests/test_iofile.py's golden/behavioral coverage the same way
test_protowire_properties.py complements the protobuf golden vectors.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from watermill_spark.sources.iofile import (
    marshal_message_line,
    unmarshal_message_line,
)

# watermill metadata is map[string]string; keys/values arbitrary unicode
_meta = st.dictionaries(st.text(max_size=20), st.text(max_size=50), max_size=8)
_payload = st.one_of(st.none(), st.binary(max_size=256))
_topic = st.text(min_size=1, max_size=40)
_uuid = st.text(min_size=1, max_size=64)


def _msg(uuid, meta, payload):
    return {"uuid": uuid, "metadata": meta, "payload": payload}


@settings(max_examples=200, deadline=None)
@given(u=_uuid, meta=_meta, payload=_payload, topic=_topic)
def test_line_roundtrip_any_values(u, meta, payload, topic):
    line = marshal_message_line(_msg(u, meta, payload), topic)
    # framing invariant: one message == one line, whatever the content
    # (payload is base64; unicode in uuid/meta/topic is JSON-escaped)
    assert "\n" not in line and "\r" not in line
    back = unmarshal_message_line(line)
    assert back is not None
    assert back["uuid"] == u
    assert back["metadata"] == meta
    assert back["payload"] == payload
    assert back["topic"] == topic


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))
def test_unmarshal_never_raises_on_junk(junk):
    """Arbitrary junk lines are skipped (None), never an exception — a
    topic file shared with foreign producers must not poison the reader."""
    out = unmarshal_message_line(junk)
    assert out is None or isinstance(out, dict)


@settings(max_examples=100, deadline=None)
@given(u=_uuid, meta=_meta, payload=_payload, topic=_topic)
def test_marshal_is_deterministic(u, meta, payload, topic):
    """Same message (minus the created_at stamp) marshals to the same
    field set: sorted keys make the layout byte-stable, so diff-based
    tooling over topic files stays meaningful."""
    import json

    a = json.loads(marshal_message_line(_msg(u, meta, payload), topic))
    b = json.loads(marshal_message_line(_msg(u, meta, payload), topic))
    a.pop("created_at"), b.pop("created_at")
    assert a == b
