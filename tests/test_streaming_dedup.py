"""Streaming near-dup filter: greedy-semantics oracle, micro-batch
invariance, chain behavior, replay idempotence, transport wiring.

The load-bearing property is that the admitted set equals the SEQUENTIAL
greedy pass (doc_id order, first-seen-wins, rejected docs register
nothing) regardless of how the stream is sliced into micro-batches — so
the brute-force Python oracle below is the ground truth everything is
compared against.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from watermill_spark.message import new_message
from watermill_spark.sources.parquet import ParquetPubSub
from watermill_spark.streaming.dedup import DUP_OF, StreamingNearDupFilter

SF = "/root/testdata/sf0.001"
N_HASHES, BAND_SIZE = 8, 2


def _bands_py(text: str | None) -> set[tuple[int, str]]:
    # Token semantics match analytics/dedup.py::_tokens: split on single
    # spaces, empty string IS a token (two empty docs are identical docs);
    # only NULL text yields no bands.
    if text is None:
        return set()
    toks = sorted(set(text.split(" ")))
    mh = [
        min(hashlib.md5(f"{s}:{t}".encode()).hexdigest() for t in toks)
        for s in range(N_HASHES)
    ]
    return {
        (b, mh[b * BAND_SIZE] + "|" + mh[b * BAND_SIZE + 1])
        for b in range(N_HASHES // BAND_SIZE)
    }


def _greedy_oracle(docs: list[tuple[int, str]]):
    """Sequential greedy first-seen-wins over doc_id order."""
    taken: dict[tuple[int, str], int] = {}
    admitted, rejected = [], {}
    for doc_id, text in sorted(docs):
        bs = _bands_py(text)
        owners = sorted(taken[b] for b in bs if b in taken)
        if owners:
            rejected[doc_id] = owners[0]
        else:
            admitted.append(doc_id)
            for b in bs:
                taken[b] = doc_id
    return set(admitted), rejected


@pytest.fixture()
def workdir():
    d = tempfile.mkdtemp(prefix="wm-streamdedup-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _corpus(spark, limit=500):
    rows = (
        spark.read.parquet(os.path.join(SF, "documents.parquet"))
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(limit)
        .collect()
    )
    return [(r.doc_id, r.text) for r in rows]


def test_one_shot_matches_greedy_oracle(spark, workdir):
    docs = _corpus(spark)
    f = StreamingNearDupFilter(spark, os.path.join(workdir, "reg"))
    adm, rej, rep = f.process_batch(
        spark.createDataFrame(docs, "doc_id LONG, text STRING"), 0
    )
    want_adm, want_rej = _greedy_oracle(docs)
    got_adm = {r.doc_id for r in adm.collect()}
    got_rej = {r.doc_id: r.dup_of for r in rej.collect()}
    assert got_adm == want_adm
    assert got_rej == want_rej
    assert rep.count() == 0
    # the near-dup-saturated corpus must actually exercise in-batch
    # conflicts — resolved by distributed rounds or the exact driver-side
    # finisher (the hybrid added in r6), depending on residue size
    assert f.last_rounds >= 1 or f.last_finish_rows > 0


def test_microbatch_invariance(spark, workdir):
    """Survivors are identical however the stream is sliced."""
    docs = _corpus(spark)
    want_adm, want_rej = _greedy_oracle(docs)
    f = StreamingNearDupFilter(spark, os.path.join(workdir, "reg"))
    got_adm, got_rej = set(), {}
    n_slices = 7
    per = (len(docs) + n_slices - 1) // n_slices
    for i in range(n_slices):
        chunk = docs[i * per : (i + 1) * per]
        if not chunk:
            continue
        adm, rej, rep = f.process_batch(
            spark.createDataFrame(chunk, "doc_id LONG, text STRING"), i
        )
        got_adm |= {r.doc_id for r in adm.collect()}
        got_rej.update({r.doc_id: r.dup_of for r in rej.collect()})
        assert rep.count() == 0
    assert got_adm == want_adm
    assert got_rej == want_rej


# Deterministic chain fixture (searched offline, pinned): bands(A)∩bands(B)
# and bands(B)∩bands(C) are non-empty while bands(A)∩bands(C) is empty —
# so greedy admits A, rejects B, and must ADMIT C because the rejected B
# registered nothing. A per-bucket-min single pass (no fixpoint) would
# wrongly reject C.
CHAIN = [
    (1, "kappa theta eps zeta delta"),
    (2, "alpha theta zeta beta eps"),
    (3, "theta alpha delta"),
]


def test_rejected_doc_does_not_block_chain(spark, workdir):
    ba, bb, bc = (_bands_py(t) for _, t in CHAIN)
    assert ba & bb and bb & bc and not (ba & bc)  # fixture still valid
    f = StreamingNearDupFilter(spark, os.path.join(workdir, "reg"))
    adm, rej, _ = f.process_batch(
        spark.createDataFrame(CHAIN, "doc_id LONG, text STRING"), 0
    )
    assert {r.doc_id for r in adm.collect()} == {1, 3}
    assert {(r.doc_id, r.dup_of) for r in rej.collect()} == {(2, 1)}
    # a 3-doc chain is far below driver_finish_rows: the exact driver
    # pass resolves it in round 0. Forcing the distributed path
    # (driver_finish_rows=0) must take the documented 2 rounds.
    assert f.last_rounds == 0 and f.last_finish_rows > 0
    fd = StreamingNearDupFilter(spark, os.path.join(workdir, "reg-dist"),
                                driver_finish_rows=0)
    adm, rej, _ = fd.process_batch(
        spark.createDataFrame(CHAIN, "doc_id LONG, text STRING"), 0
    )
    assert {r.doc_id for r in adm.collect()} == {1, 3}
    assert {(r.doc_id, r.dup_of) for r in rej.collect()} == {(2, 1)}
    assert fd.last_rounds == 2  # round 1 admits A rejects B; round 2 admits C


def test_chain_across_batches(spark, workdir):
    """Same chain, one doc per micro-batch — prefix state via the registry."""
    f = StreamingNearDupFilter(spark, os.path.join(workdir, "reg"))
    verdicts = []
    for i, (doc_id, text) in enumerate(CHAIN):
        adm, rej, _ = f.process_batch(
            spark.createDataFrame([(doc_id, text)], "doc_id LONG, text STRING"), i
        )
        verdicts.append((sorted(r.doc_id for r in adm.collect()),
                         sorted(r.doc_id for r in rej.collect())))
    assert verdicts == [([1], []), ([], [2]), ([3], [])]


def test_replay_is_idempotent(spark, workdir):
    docs = _corpus(spark, limit=100)
    f = StreamingNearDupFilter(spark, os.path.join(workdir, "reg"))
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    adm1, rej1, rep1 = f.process_batch(df, 0)
    adm_ids = {r.doc_id for r in adm1.collect()}
    rej_map = {r.doc_id: r.dup_of for r in rej1.collect()}
    reg_rows = f.registry().count()
    assert rep1.count() == 0

    # Redelivery of the same slice (at-least-once): admitted docs come back
    # as replays, rejections are reproduced, the registry does not grow.
    adm2, rej2, rep2 = f.process_batch(df, 1)
    assert {r.doc_id for r in rep2.collect()} == adm_ids
    assert {r.doc_id: r.dup_of for r in rej2.collect()} == rej_map
    assert adm2.count() == 0
    assert f.registry().count() == reg_rows


def test_empty_and_null_text_semantics(spark, workdir):
    """Empty-string docs are identical docs (dedupe against each other);
    NULL-text docs produce no bands and are always admitted."""
    f = StreamingNearDupFilter(spark, os.path.join(workdir, "reg"))
    adm, rej, _ = f.process_batch(
        spark.createDataFrame([(7, ""), (8, "alpha beta gamma"), (10, None)],
                              "doc_id LONG, text STRING"), 0
    )
    assert {r.doc_id for r in adm.collect()} == {7, 8, 10}
    assert rej.count() == 0
    adm2, rej2, _ = f.process_batch(
        spark.createDataFrame([(9, ""), (11, None)], "doc_id LONG, text STRING"), 1
    )
    assert {r.doc_id for r in adm2.collect()} == {11}
    assert {(r.doc_id, r.dup_of) for r in rej2.collect()} == {(9, 7)}


def test_attach_end_to_end(spark, workdir):
    """Transport wiring: in_topic → admitted/duplicates topics, per-file
    micro-batches, DUP_OF stamped, batch commits recorded."""
    docs = _corpus(spark, limit=200)
    want_adm, want_rej = _greedy_oracle(docs)
    ps = ParquetPubSub(spark, os.path.join(workdir, "topics"))
    # three ordered publishes -> three files -> three micro-batches
    per = (len(docs) + 2) // 3
    for i in range(3):
        chunk = docs[i * per : (i + 1) * per]
        msgs = [
            new_message(text, metadata={"doc_id": str(doc_id)},
                        uuid=f"m{doc_id}")
            for doc_id, text in chunk
        ]
        ps.publish("docs_in", spark.createDataFrame(
            msgs, schema="uuid STRING, metadata MAP<STRING,STRING>, "
                         "payload BINARY, topic STRING, event_time TIMESTAMP"
        ).coalesce(1))
    f = StreamingNearDupFilter(spark, os.path.join(workdir, "reg"))
    q = f.attach(ps, "docs_in", "docs_ok", "docs_dup",
                 os.path.join(workdir, "cp"), max_files_per_trigger=1)
    q.awaitTermination(300)

    ok = ps.subscribe("docs_ok")
    dup = ps.subscribe("docs_dup")
    got_adm = {int(r.uuid[1:]) for r in ok.select("uuid").collect()}
    got_rej = {
        int(r.uuid[1:]): int(r.metadata[DUP_OF])
        for r in dup.select("uuid", "metadata").collect()
    }
    assert got_adm == want_adm
    assert got_rej == want_rej
    # idempotent-sink commit markers: one per micro-batch
    commits = os.listdir(os.path.join(workdir, "cp", "commits-neardup"))
    assert len([c for c in commits if not c.endswith(".tmp")]) >= 3


def test_crash_replay_same_batch_id(spark, workdir):
    """Crash between the registry append and the batch commit marker ⇒
    Structured Streaming replays the SAME batch_id. The re-derivation must
    read only prefix state (its own half-committed subdir excluded), so it
    reproduces the original decisions exactly and the overwrite rewrites
    the same rows — found in review: reading its own rows classified its
    own admissions as replays and ERASED them from the registry."""
    docs = _corpus(spark, limit=120)
    want_adm, want_rej = _greedy_oracle(docs)
    f = StreamingNearDupFilter(spark, os.path.join(workdir, "reg"))
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")

    adm1, rej1, rep1 = f.process_batch(df, 0)  # registry written, "crash"
    reg_after_first = {
        (r.band_idx, r.band_key, r.owner) for r in f.registry().collect()
    }
    adm2, rej2, rep2 = f.process_batch(df, 0)  # replay, same batch_id
    assert {r.doc_id for r in adm2.collect()} == want_adm
    assert {r.doc_id: r.dup_of for r in rej2.collect()} == want_rej
    assert rep2.count() == 0  # a replayed batch is not "redelivery"
    reg_after_replay = {
        (r.band_idx, r.band_key, r.owner) for r in f.registry().collect()
    }
    assert reg_after_replay == reg_after_first  # registry content identical

    # and the NEXT batch still sees the admissions (nothing was erased)
    adm3, rej3, rep3 = f.process_batch(df, 1)
    assert adm3.count() == 0
    assert {r.doc_id for r in rep3.collect()} == want_adm
    assert {r.doc_id: r.dup_of for r in rej3.collect()} == want_rej


def test_registry_compaction_preserves_decisions(spark, workdir):
    """compact_registry() merges per-batch subdirs into one generation
    without changing any verdict; a crash that leaves both generations on
    disk (duplicate rows) is also harmless."""
    import os as _os
    import shutil as _shutil

    docs = _corpus(spark, limit=300)
    f = StreamingNearDupFilter(spark, _os.path.join(workdir, "reg"))
    per = 100
    for i in range(3):
        f.process_batch(
            spark.createDataFrame(docs[i * per : (i + 1) * per],
                                  "doc_id LONG, text STRING"), i
        )
    before = {(r.band_idx, r.band_key, r.owner) for r in f.registry().collect()}
    assert len([d for d in _os.listdir(f.registry_dir)
                if d.startswith("batch=")]) == 3

    # simulate the crash window: consolidated gen written, old dirs still
    # present -> duplicate rows must not change anything
    res = f.compact_registry(target_files=2)
    assert res == {"before": 3, "after": 1}
    after = {(r.band_idx, r.band_key, r.owner) for r in f.registry().collect()}
    assert after == before

    # decisions identical post-compaction: replaying the same docs yields
    # all-replay/all-same-rejects, and a fresh doc still dedups correctly
    adm, rej, rep = f.process_batch(
        spark.createDataFrame(docs, "doc_id LONG, text STRING"), 99
    )
    want_adm, want_rej = _greedy_oracle(docs)
    assert {r.doc_id for r in rep.collect()} == want_adm
    assert {r.doc_id: r.dup_of for r in rej.collect()} == want_rej
    assert adm.count() == 0

    # crash-window duplicates: copy the consolidated gen under a batch name
    comp = [d for d in _os.listdir(f.registry_dir) if d.startswith("compacted-")]
    _shutil.copytree(_os.path.join(f.registry_dir, comp[0]),
                     _os.path.join(f.registry_dir, "batch=777"))
    dup_rows = f.registry()
    assert dup_rows.count() > len(before)  # rows really are duplicated
    _, rej2, rep2 = f.process_batch(
        spark.createDataFrame(docs, "doc_id LONG, text STRING"), 100
    )
    assert {r.doc_id for r in rep2.collect()} == want_adm
    assert {r.doc_id: r.dup_of for r in rej2.collect()} == want_rej


def test_attach_passes_identityless_messages_through(spark, workdir):
    """Messages without a numeric doc_id cannot be deduped or attributed —
    they must pass through to the out topic, not silently vanish on the
    inner joins (review finding)."""
    ps = ParquetPubSub(spark, os.path.join(workdir, "topics"))
    from watermill_spark.message import messages_df

    msgs = [
        new_message("alpha beta gamma delta", metadata={"doc_id": "1"}, uuid="d1"),
        new_message("no id at all", metadata={}, uuid="anon-1"),
        new_message("bad id", metadata={"doc_id": "doc-x"}, uuid="anon-2"),
    ]
    ps.publish("din", messages_df(spark, msgs))
    f = StreamingNearDupFilter(spark, os.path.join(workdir, "reg"))
    q = f.attach(ps, "din", "dout", "ddup", os.path.join(workdir, "cp"))
    assert q.awaitTermination(300)
    assert {r.uuid for r in ps.subscribe("dout").collect()} == {
        "d1", "anon-1", "anon-2",
    }
    assert ps.subscribe("ddup").count() == 0
    # identity-less docs registered nothing
    assert f.registry().count() == 4  # d1's bands only (8 hashes / band 2)


def test_max_rounds_fallback_is_exact(spark, workdir):
    """Hitting max_rounds must not kill the batch (it would poison-loop the
    stream on replay): the residual docs are finished by an exact
    driver-side sequential pass with identical results."""
    f = StreamingNearDupFilter(spark, os.path.join(workdir, "reg"), max_rounds=1)
    adm, rej, _ = f.process_batch(
        spark.createDataFrame(CHAIN, "doc_id LONG, text STRING"), 0
    )
    # the A-B-C chain needs 2 distributed rounds; round 2 is replaced by
    # the driver-side pass, same greedy result
    assert {r.doc_id for r in adm.collect()} == {1, 3}
    assert {(r.doc_id, r.dup_of) for r in rej.collect()} == {(2, 1)}


def test_residue_cap_refuses_oversized_driver_collect(spark, workdir):
    """The max_rounds escape hatch counts its residue BEFORE collecting and
    fails loudly with sizing guidance past residue_cap, so an adversarial
    in-batch conflict chain can never materialize an arbitrarily large
    micro-batch on the driver (r5 verdict item 6)."""
    from watermill_spark.streaming.dedup import ResidueCapExceeded

    f = StreamingNearDupFilter(
        spark, os.path.join(workdir, "reg"), max_rounds=1, residue_cap=0
    )
    with pytest.raises(ResidueCapExceeded, match="Lower the trigger size"):
        f.process_batch(
            spark.createDataFrame(CHAIN, "doc_id LONG, text STRING"), 0
        )


# -- single-writer registry lease (r5 verdict item 3) -------------------------


def test_lease_excludes_second_writer_and_steals_stale(workdir):
    from watermill_spark.streaming.dedup import (
        RegistryLease,
        RegistryLeaseLost,
        RegistryLockedError,
    )

    reg = os.path.join(workdir, "reg")
    a = RegistryLease(reg, owner="a").acquire()
    with pytest.raises(RegistryLockedError, match="one attached stream"):
        RegistryLease(reg, owner="b").acquire()
    a.verify_and_heartbeat()  # held, fresh
    a.release()
    b = RegistryLease(reg, owner="b").acquire()  # clean handoff
    # stale takeover: c finds b's heartbeat older than ttl and steals
    old = time.time() - 10
    os.utime(b.path, (old, old))
    c = RegistryLease(reg, owner="c", ttl=5).acquire()
    c.verify_and_heartbeat()
    # b is fenced out: its next verify must refuse to write
    with pytest.raises(RegistryLeaseLost, match="stolen"):
        b.verify_and_heartbeat()


def test_attach_is_single_writer_then_hands_off(spark, workdir):
    """Two routers, one registry: the second attach fails loudly while the
    first holds the lease; after release the successor dedups against the
    predecessor's admissions (overlapping corpora -> no double-admit, no
    lost admission)."""
    from watermill_spark.message import messages_df
    from watermill_spark.streaming.dedup import RegistryLockedError

    ps = ParquetPubSub(spark, os.path.join(workdir, "topics"))
    reg = os.path.join(workdir, "reg")
    ps.publish("in_a", messages_df(spark, [
        new_message("alpha beta gamma delta", metadata={"doc_id": "1"}, uuid="a1"),
    ]))
    f_a = StreamingNearDupFilter(spark, reg)
    q_a = f_a.attach(ps, "in_a", "ok", "dup", os.path.join(workdir, "cp_a"))
    # concurrent second writer on the SAME registry is refused
    f_b = StreamingNearDupFilter(spark, reg)
    with pytest.raises(RegistryLockedError, match="one attached stream"):
        f_b.attach(ps, "in_b", "ok", "dup", os.path.join(workdir, "cp_b"))
    assert q_a.awaitTermination(300)
    f_a.release_lease()
    # handoff: B now ingests an overlapping corpus — doc 2 is a near-dup
    # of A's admitted doc 1 and must be rejected against A's registry
    ps.publish("in_b", messages_df(spark, [
        new_message("alpha beta gamma delta", metadata={"doc_id": "2"}, uuid="b2"),
        new_message("completely different words here", metadata={"doc_id": "3"}, uuid="b3"),
    ]))
    q_b = f_b.attach(ps, "in_b", "ok", "dup", os.path.join(workdir, "cp_b2"))
    assert q_b.awaitTermination(300)
    f_b.release_lease()
    assert {r.uuid for r in ps.subscribe("ok").collect()} == {"a1", "b3"}
    dup = ps.subscribe("dup").collect()
    assert [(r.uuid, r.metadata[DUP_OF]) for r in dup] == [("b2", "1")]


def test_writer_namespace_batch_dirs(spark, workdir):
    """Attached writers namespace their registry batch subdirs by
    checkpoint identity: replay exclusion finds exactly this writer's own
    previous write, and a different writer's batch 0 can never collide."""
    reg = os.path.join(workdir, "reg")
    f = StreamingNearDupFilter(spark, reg)
    f.writer_ns = "aaaa1111"
    f.process_batch(
        spark.createDataFrame([(1, "alpha beta gamma delta")],
                              "doc_id LONG, text STRING"), 0
    )
    assert os.path.isdir(os.path.join(reg, "batch=aaaa1111-0"))
    # replay exclusion hides only the namespaced own batch
    assert f.registry(exclude_batch=0).count() == 0
    assert f.registry().count() > 0
    # a second writer's batch 0 lands in its own namespace, reading the
    # first writer's rows as prefix state (identical doc => rejected)
    g = StreamingNearDupFilter(spark, reg)
    g.writer_ns = "bbbb2222"
    _, rej, _ = g.process_batch(
        spark.createDataFrame([(2, "alpha beta gamma delta")],
                              "doc_id LONG, text STRING"), 0
    )
    assert {(r.doc_id, r.dup_of) for r in rej.collect()} == {(2, 1)}
    assert os.path.isdir(os.path.join(reg, "batch=aaaa1111-0"))  # untouched
