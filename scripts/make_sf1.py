#!/usr/bin/env python
"""Generate sf1 test data (10x sf0.1) for the scale probe, by deterministic
replication of the driver's sf0.1 parquet with key-shifting.

The driver ships sf{0.001,0.01,0.1} only; scale-probing the heavy operators
at ~6M lineitem rows needs sf1. Rather than invent a new generator (whose
distributions would not be comparable), each table is replicated 10x with
per-replica key offsets chosen above every key domain's max, so

- FK relationships hold within each replica (orders->customer,
  lineitem->orders/part/supplier, all replicas share the tiny region/nation
  dims);
- per-key group sizes (orders per customer, events per user, lines per
  order) are IDENTICAL to sf0.1 -- the data gets wider, not skewed, which
  is what a scale factor means;
- `documents.text` gets every token suffixed with the replica tag (replica
  0 unchanged): shingle POSTING LISTS keep their sf0.1 sizes (no
  cross-replica shingle collisions), so the dup/near-dup pair structure
  scales exactly 10x instead of every document acquiring 9 artificial
  exact copies (which would explode LSH candidate pairs ~45x and measure a
  different workload);
- `embeddings.embedding` is component-rolled by the replica index:
  intra-replica geometry (and thus per-query neighbor structure) is
  preserved exactly, while cross-replica cosines decorrelate -- a 10x
  corpus with the same local similarity statistics. Replica 0 keeps the
  original vectors, so the vec_id<10 query set is untouched.

Everything is a pure function of the input bytes -- no RNG. Output goes to
testdata_sf1/ (gitignored); parquet schemas are byte-compatible with the
originals (the final cast to the source schema preserves whatever physical
timestamp layout the driver generation shipped -- TIMESTAMP(NANOS) in
earlier generations, timestamp[us] now; tables.load_table normalizes both).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
# Defaults build sf1 (10 replicas); SPARK_GRAFT_REPLICAS=100 with
# SPARK_GRAFT_SF_DST=testdata_sf10 builds the third decade of the scaling
# curve from the same construction.
DST = os.environ.get(
    "SPARK_GRAFT_SF_DST",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata_sf1"),
)
REPLICAS = int(os.environ.get("SPARK_GRAFT_REPLICAS", "10"))

# per-domain offsets, each > the domain's sf0.1 max (checked below)
OFF = {
    "custkey": 1_000_000,
    "suppkey": 1_000_000,
    "partkey": 1_000_000,
    "orderkey": 10_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}

# table -> {column: offset-domain}
SHIFTS: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}


def shifted(table: pa.Table, shifts: dict[str, str], r: int) -> pa.Table:
    out = table
    for col, domain in shifts.items():
        idx = out.schema.get_field_index(col)
        arr = pc.add(out.column(col), pa.scalar(r * OFF[domain], type=out.schema.field(col).type))
        out = out.set_column(idx, out.schema.field(col), arr)
    return out


def salt_documents(table: pa.Table, r: int) -> pa.Table:
    if r == 0:
        return table
    texts = table.column("text").to_pylist()
    tag = f"_r{r}"
    salted = [" ".join(w + tag for w in t.split()) for t in texts]
    out = table.set_column(
        table.schema.get_field_index("text"), table.schema.field("text"), pa.array(salted, pa.string())
    )
    n_chars = pa.array([len(t) for t in salted], table.schema.field("n_chars").type)
    return out.set_column(out.schema.get_field_index("n_chars"), out.schema.field("n_chars"), n_chars)


def roll_embeddings(table: pa.Table, r: int) -> pa.Table:
    if r == 0:
        return table
    vecs = np.array(table.column("embedding").to_pylist(), dtype=np.float32)
    rolled = np.roll(vecs, r % vecs.shape[1], axis=1)
    # roll wraps at dim (=64): past one full wrap, negate so replica r and
    # replica r-64 do not become exact duplicate vectors (negation flips
    # every cosine's sign -- fully decorrelated, same geometry)
    if (r // vecs.shape[1]) % 2 == 1:
        rolled = -rolled
    emb_type = table.schema.field("embedding").type
    arr = pa.array([row for row in rolled.tolist()], emb_type)
    return table.set_column(
        table.schema.get_field_index("embedding"), table.schema.field("embedding"), arr
    )


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    for t, shifts in SHIFTS.items():
        src = pq.read_table(f"{SRC}/{t}.parquet")
        for col, domain in shifts.items():
            mx = pc.max(src.column(col)).as_py()
            if mx >= OFF[domain]:
                sys.exit(f"{t}.{col} max {mx} >= offset {OFF[domain]}")
        # stream one replica per row-group batch: at 100 replicas the
        # concat-then-write form would hold the whole 100x table in memory
        n_out = 0
        with pq.ParquetWriter(f"{DST}/{t}.parquet", src.schema) as w:
            for r in range(REPLICAS):
                rep = shifted(src, shifts, r)
                if t == "documents":
                    rep = salt_documents(rep, r)
                if t == "embeddings":
                    rep = roll_embeddings(rep, r)
                rep = rep.cast(src.schema)
                w.write_table(rep)
                n_out += rep.num_rows
        print(f"{t}: {src.num_rows} -> {n_out}")
    for t in ("region", "nation"):
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"), f"{DST}/{t}.parquet")
        print(f"{t}: copied")


if __name__ == "__main__":
    main()
