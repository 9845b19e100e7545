"""Examples-as-tests: the `dev/validate-examples` analog — every script in
`examples/` runs green or CI fails, so the gallery can't drift from the
library (`/root/reference/dev/validate-examples`, `_examples/` with 26
validated apps)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_example_router_dlq(spark, tmp_path):
    from examples import example_01_router_dlq as mod  # noqa: F401 — see import shim below

    assert mod.main(spark, str(tmp_path / "topics")) == {
        "processed": 7,
        "poisoned": 3,
        "requeued": 3,
    }


def test_example_cqrs(spark):
    from examples import example_02_cqrs as mod

    assert mod.main(spark) == {"total_revenue": 850, "bookings": 3}


def test_example_delayed_delivery(spark, tmp_path):
    from examples import example_03_delayed_delivery as mod

    out = mod.main(spark, str(tmp_path / "topics"))
    assert out["released_total"] == 4


def test_example_metrics(spark, tmp_path):
    from examples import example_04_metrics as mod

    out = mod.main(spark, str(tmp_path / "ex4"))
    assert out["messages_total"] == 40
    assert out["exposition_has_counter"]


def test_example_exactly_once_counter(spark, tmp_path):
    from examples import example_05_exactly_once_counter as mod

    out = mod.main(spark, str(tmp_path / "ex5"))
    assert out["counter_value"] == 12
    assert out["replay_batches_applied"] == 0


def test_example_fanin_fanout(spark, tmp_path):
    from examples import example_06_fanin_fanout as mod

    out = mod.main(spark, str(tmp_path / "ex6"))
    assert out["merged_total"] == 10
    assert out["per_source"] == {"clicks": 5, "purchases": 3, "refunds": 2}
    assert out["audit_total"] == 10 and out["feed_total"] == 10


def test_example_forwarder_outbox(spark, tmp_path):
    from examples import example_07_forwarder_outbox as mod

    assert mod.main(spark, str(tmp_path / "ex7")) == {
        "orders_eu": 3,
        "orders_us": 3,
        "orders_apac": 2,
        "outbox_total": 8,
    }


def test_example_request_reply(spark, tmp_path):
    from examples import example_08_request_reply as mod

    out = mod.main(spark, str(tmp_path / "ex8"))
    assert out["reply_a"] == "charged:cmd-A"
    assert out["reply_b"] == "charged:cmd-B"
    assert out["replies_each"] == (1, 1)
    assert out["no_errors"]


def test_example_consumer_groups(spark, tmp_path):
    from examples import example_09_consumer_groups as mod

    out = mod.main(spark, str(tmp_path / "ex9"))
    assert out == {
        "crm_seen": 12,
        "newsletter_seen": 12,
        "redelivered_page": 6,
        "newsletter_subscribed": 8,
    }


def test_example_transactional_events(spark, tmp_path):
    from examples import example_10_transactional_events as mod

    out = mod.main(spark, str(tmp_path / "ex10"))
    assert out == {
        "committed_signups": 3,
        "aborted_signup_published": False,
        "users_rows": 3,
        "forwarded": 3,
        "forwarded_on_second_pass": 0,
        "broker_events": 3,
    }


def test_example_realtime_feed(spark, tmp_path):
    from examples import example_11_realtime_feed as mod

    out = mod.main(spark, str(tmp_path / "ex11"))
    assert out["counted"] == 19          # every valid post got a count event
    assert out["feed_posts"] == 19 and out["feed_authors"] == 4
    assert out["poisoned"] == 2          # 1 bad message x 2 handler DLQs


def test_example_webhooks(spark, tmp_path):
    from examples import example_12_webhooks as mod

    out = mod.main(spark, str(tmp_path / "ex12"))
    assert out["webhooks_received"] == 5
    assert out["published"] == 5
    assert out["delivered_downstream"] == 5 and out["delivered_ok"] == 5
    assert out["kinds"] == ["push"]


def test_example_persistent_event_log(spark, tmp_path):
    from examples import example_13_persistent_event_log as mod

    out = mod.main(spark, str(tmp_path / "ex13"))
    assert out["logged"] == 10
    assert out["audit_by_name"] == {"OrderPlaced": 5, "UserSignedUp": 5}
    assert out["replayed"] == 10
    assert out["projection_matches_audit"]
    assert out["all_stamped"] == 10


def test_example_synchronizing_databases(spark, tmp_path):
    from examples import example_14_synchronizing_databases as mod

    out = mod.main(spark, str(tmp_path / "ex14"))
    assert out["replicated_first_pass"] == 6
    assert out["replicated_total"] == 10
    assert out["distinct_ids"] == 10
    assert out["sample"] == {"id": 0, "username": "u0", "full_name": "First0 Last0"}


def test_example_delayed_requeue(spark, tmp_path):
    from examples import example_15_delayed_requeue as mod

    out = mod.main(spark, str(tmp_path / "ex15"))
    assert out == {
        "processed_first_pass": 4,
        "requeued_early": 0,
        "processed_total": 6,
        "retried": 2,
    }


def test_example_server_sent_events(spark, tmp_path):
    from examples import example_16_server_sent_events as mod

    out = mod.main(spark, str(tmp_path / "ex16"))
    assert out["backlog_frames"] == 2      # frames pushed from the backlog
    assert out["total_frames"] == 4        # + the two new spark posts, live
    assert out["titles"] == ["post #0", "post #1", "post #3", "post #5"]


def test_example_cqrs_ordered_events(spark, tmp_path):
    from examples import example_17_cqrs_ordered_events as mod

    out = mod.main(spark, str(tmp_path / "ex17"))
    assert out["subscribers"] == {"alice": "alice@final.example"}  # bob left
    assert out["events_total"] == 5
    assert out["timeline"] == [
        "0:subscribed:alice",
        "1:subscribed:bob",
        "2:email_updated:alice",
        "3:unsubscribed:bob",
        "4:email_updated:alice",
    ]


def test_example_io_quickstart(spark, tmp_path):
    from examples import example_18_io_quickstart as mod

    out = mod.main(spark, str(tmp_path / "ex18"))
    assert out == {
        "enriched": 5,
        "ndjson_lines": 5,
        "via_io_subscriber": 5,
        "shell_produced": 2,
    }


def test_example_training_data_ingest(spark, tmp_path):
    from examples import example_19_training_data_ingest as mod

    out = mod.main(spark, str(tmp_path / "ex19"))
    # 60 corpus docs + 2 junk: both junk docs rejected at the quality
    # gate with distinct reasons; the dup-saturated sf0.001 corpus leaves
    # 3 first-seen survivors (greedy, deterministic), everything else is
    # a near-dup attributed to an admitted doc
    assert out["raw"] == 62
    assert out["low_quality"] == {"too_short": 1, "low_alpha_ratio": 1}
    assert out["clean"] == 3
    assert out["near_dups"] == 57
    assert out["clean"] + out["near_dups"] == 60
    assert out["sample_dup_of"] == [0]
    assert out["registry_rows"] == 12


def test_example_semantic_dedup_gate(spark, tmp_path):
    from examples import example_20_semantic_dedup_gate as mod

    out = mod.main(spark, str(tmp_path / "ex20"))
    # 50 corpus vectors + 5 verbatim re-submissions + 1 embedding-less doc:
    # every re-submission is rejected and blamed on its original (exact
    # cosine 1.0 >= tau; identical vectors always share every band); the
    # embedding-less doc passes (the gate never blocks on missing features)
    assert out["raw"] == 56
    assert out["clean"] == 51
    assert out["semantic_dups"] == {1000 + k: k for k in (0, 10, 20, 30, 40)}
    assert out["no_embedding_passed"] == 1
    assert out["registry_vec_rows"] == 50
