"""tools_gen_scale.py contract tests: the sfN synthesizer must preserve
referential integrity, per-replica distributions, and the two perturbation
invariants (within-replica embedding geometry exact; cross-replica document
divergence) — the properties the SCALE.md sf1/sf5 runs rely on."""

from __future__ import annotations

import math
import subprocess
import sys
from pathlib import Path

import pyarrow.parquet as pq
import pytest

REPO = Path(__file__).resolve().parents[1]
SRC = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def gen_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("scale") / "sf0.2"
    subprocess.run(
        [sys.executable, str(REPO / "tools_gen_scale.py"), "2", str(out)],
        check=True,
        cwd=str(REPO),
        capture_output=True,
    )
    return out


def test_row_counts_scale_linearly(gen_dir):
    for table, mult in [
        ("lineitem", 2), ("orders", 2), ("customer", 2), ("supplier", 2),
        ("part", 2), ("events", 2), ("documents", 2), ("embeddings", 2),
        ("nation", 1), ("region", 1),  # dims stay single-copy
    ]:
        src = pq.read_metadata(f"{SRC}/{table}.parquet").num_rows
        got = pq.read_metadata(str(gen_dir / f"{table}.parquet")).num_rows
        assert got == src * mult, table


def test_referential_integrity_and_key_disjointness(gen_dir):
    orders = pq.read_table(
        str(gen_dir / "orders.parquet"), columns=["o_orderkey", "o_custkey"]
    )
    li = pq.read_table(
        str(gen_dir / "lineitem.parquet"), columns=["l_orderkey"]
    )
    cust = pq.read_table(
        str(gen_dir / "customer.parquet"), columns=["c_custkey"]
    )
    okeys = set(orders["o_orderkey"].to_pylist())
    assert len(okeys) == orders.num_rows  # replica keys never collide
    assert set(li["l_orderkey"].to_pylist()) <= okeys  # FK holds post-shift
    assert set(orders["o_custkey"].to_pylist()) <= set(
        cust["c_custkey"].to_pylist()
    )


def test_schema_identical_to_source(gen_dir):
    for table in ("lineitem", "events", "embeddings", "documents"):
        src = pq.read_table(f"{SRC}/{table}.parquet")
        got = pq.read_table(str(gen_dir / f"{table}.parquet"))
        assert got.schema.remove_metadata().equals(
            src.schema.remove_metadata()
        ), table


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return dot / (na * nb)


def test_embedding_sign_flip_preserves_within_replica_geometry(gen_dir):
    src = pq.read_table(f"{SRC}/embeddings.parquet").to_pylist()
    got = pq.read_table(str(gen_dir / "embeddings.parquet")).to_pylist()
    n = len(src)
    by_id = {r["vec_id"]: r for r in got}
    a0, b0 = src[0], src[1]
    off = 10000  # vec_id offset for replica 1 (next_pow10 of max+1)
    a1, b1 = by_id[a0["vec_id"] + off], by_id[b0["vec_id"] + off]
    # within-replica cosine is bit-preserved by the +-1 diagonal transform
    assert _cos(a1["embedding"], b1["embedding"]) == pytest.approx(
        _cos(a0["embedding"], b0["embedding"]), abs=1e-12
    )
    # cross-replica geometry decorrelates: the replica twin is NOT the
    # original vector (some sign flipped)
    assert a1["embedding"] != a0["embedding"]
    assert len(got) == 2 * n
    assert a1["label"] == a0["label"]


def test_document_replicas_are_not_near_duplicates(gen_dir):
    src = pq.read_table(
        f"{SRC}/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    got = pq.read_table(
        str(gen_dir / "documents.parquet"), columns=["doc_id", "text", "n_chars"]
    ).to_pylist()
    by_id = {r["doc_id"]: r for r in got}
    off = 10000
    checked = 0
    for r in src[:50]:
        twin = by_id[r["doc_id"] + off]
        t0, t1 = set(r["text"].split(" ")), set(twin["text"].split(" "))
        j = len(t0 & t1) / len(t0 | t1)
        assert j < 0.75, "replica twin must not survive a 0.9-Jaccard gate"
        assert twin["n_chars"] == len(twin["text"])
        checked += 1
    assert checked == 50
