"""Scale-factor synthesizer: build sfN testdata from sf0.1 by key-offset
replication (VERDICT r3 #1: prove linear scaling at sf1+ instead of
asserting it).

Each replica i shifts every key space by i * next_pow10(max_key+1), so
referential integrity (lineitem->orders->customer, part, supplier) and all
per-key distributions are preserved exactly; dimension tables (region,
nation) stay single-copy, mirroring how real fact growth works. Entity
names get a replica suffix so name<->key stays 1:1. Two perturbations keep
the LLM-pipeline tables honest at scale:

- documents: replica i>0 rewrites ~1/3 of tokens (deterministic crc32
  choice) so replicas are NOT near-duplicates of each other — duplicate
  *clusters* replicate at constant size (10x docs => 10x clusters => ~10x
  candidate pairs, the real-corpus shape), instead of growing 10x deeper
  (which would quadratically explode every blocked pair join and model
  nothing).
- embeddings: replica i>0 multiplies every vector by a seeded +-1 diagonal
  (an orthogonal transform) — within-replica cosines/buckets are preserved
  bit-for-bit while cross-replica geometry decorrelates.

Output: one .parquet FILE per table (DuckDB-readable path shape, identical
to /root/testdata) but written with bounded row groups so Spark plans
parallel scan tasks at sf1 (the sf0.1 files are single-row-group; real
100-TB inputs are many-row-group, this matches them).

Usage: python tools_gen_scale.py <replicas> <out_dir>
       python tools_gen_scale.py 10 scale_data/sf1
"""

from __future__ import annotations

import os
import sys
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# key column -> the table that owns its id space (offsets must agree on
# both sides of every foreign key)
OWNER = {
    "c_custkey": "c_custkey",
    "o_custkey": "c_custkey",
    "s_suppkey": "s_suppkey",
    "l_suppkey": "s_suppkey",
    "p_partkey": "p_partkey",
    "l_partkey": "p_partkey",
    "o_orderkey": "o_orderkey",
    "l_orderkey": "o_orderkey",
    "event_id": "event_id",
    "user_id": "user_id",
    "doc_id": "doc_id",
    "vec_id": "vec_id",
}
NAME_SUFFIX = {"customer": "c_name", "supplier": "s_name", "part": "p_name"}


def next_pow10(n: int) -> int:
    p = 1
    while p <= n:
        p *= 10
    return p


def _offsets() -> dict[str, int]:
    off: dict[str, int] = {}
    for table, cols in KEYS.items():
        t = pq.read_table(f"{SRC}/{table}.parquet", columns=[c for c in cols])
        for c in cols:
            owner = OWNER[c]
            m = pc.max(t[c]).as_py()
            off[owner] = max(off.get(owner, 0), next_pow10(int(m) + 1))
    return off


def _perturb_text(text: str, i: int) -> str:
    toks = text.split(" ")
    return " ".join(
        t + f"r{i}" if (zlib.crc32(t.encode()) + i) % 3 == 0 else t
        for t in toks
    )


def _replicate(table: str, t: pa.Table, i: int, off: dict[str, int]) -> pa.Table:
    if i == 0:
        return t
    for c in KEYS[table]:
        col = t[c]
        shifted = pc.cast(
            pc.add(col, pa.scalar(i * off[OWNER[c]], type=col.type)), col.type
        )
        t = t.set_column(t.schema.get_field_index(c), t.field(c), shifted)
    name_col = NAME_SUFFIX.get(table)
    if name_col:
        col = t[name_col]
        suffixed = pc.binary_join_element_wise(
            col, pa.scalar(f"r{i}"), pa.scalar("")
        )
        t = t.set_column(
            t.schema.get_field_index(name_col), t.field(name_col), suffixed
        )
    if table == "documents":
        texts = [_perturb_text(x, i) for x in t["text"].to_pylist()]
        arr = pa.array(texts, type=t.field("text").type)
        t = t.set_column(t.schema.get_field_index("text"), t.field("text"), arr)
        n_chars = pa.array(
            [len(x) for x in texts], type=t.field("n_chars").type
        )
        t = t.set_column(
            t.schema.get_field_index("n_chars"), t.field("n_chars"), n_chars
        )
    if table == "embeddings":
        col = t["embedding"].combine_chunks()
        values = np.asarray(col.values)
        offsets = np.asarray(col.offsets)
        dims = np.diff(offsets)
        assert dims.min() == dims.max(), "variable-dim embeddings unexpected"
        dim = int(dims[0])
        signs = np.random.RandomState(1000 + i).choice(
            np.array([-1.0, 1.0], dtype=values.dtype), size=dim
        )
        flipped = (values.reshape(-1, dim) * signs).reshape(-1)
        arr = pa.ListArray.from_arrays(
            col.offsets, pa.array(flipped, type=col.values.type)
        ).cast(t.field("embedding").type)
        t = t.set_column(
            t.schema.get_field_index("embedding"), t.field("embedding"), arr
        )
    return t


def main() -> None:
    replicas = int(sys.argv[1])
    out_dir = sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)
    off = _offsets()
    print("key offsets:", off)
    for table in ("region", "nation"):  # dims: single copy
        src = pq.read_table(f"{SRC}/{table}.parquet")
        pq.write_table(src, f"{out_dir}/{table}.parquet")
        print(f"{table}: {src.num_rows} rows (dim, 1 copy)")
    for table in KEYS:
        src = pq.read_table(f"{SRC}/{table}.parquet")
        parts = [_replicate(table, src, i, off) for i in range(replicas)]
        full = pa.concat_tables(parts)
        # bounded row groups -> parallel scan tasks (>=32 groups for facts)
        rg = max(10_000, full.num_rows // 32)
        pq.write_table(full, f"{out_dir}/{table}.parquet", row_group_size=rg)
        print(f"{table}: {full.num_rows} rows, row_group_size={rg}")


if __name__ == "__main__":
    main()
