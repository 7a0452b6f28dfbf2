#!/usr/bin/env python3
"""Synthesize a LARGER deterministic fixture from an existing sf dir, for
core-scaling measurement only (plans/r18; the r17 verdict's item 6: sf0.1
cannot discriminate serial from parallel — no query is CPU-bound there).

Shape: every entity/fact table is replicated K times with a disjoint key
offset per replica (referential integrity preserved: orders.o_custkey,
lineitem.l_{order,part,supp}key move together), so joins/graphs scale by K
without changing per-key distributions. documents.text gets a DETERMINISTIC
per-(replica, doc) word shuffle for replicas > 0 — verbatim replication
would make the replicated corpus a K-fold exact-duplicate blowup and hand
the pair kernels quadratic cross-replica duplicate mass no real corpus has
(the shuffle destroys k-gram overlap while keeping length/vocabulary
realistic). embeddings rotate components per replica (norm-preserving, new
geometry). Dimension tables (region, nation) copy as-is.

This fixture feeds ONLY the committed scaling artifact (bench with
SPARK_GRAFT_ONLY over the heavy kernels, c8 vs c32). It is NOT an oracle
surface: nothing here touches what any declared query computes.

Usage: gen_scale_fixture.py <src_sf_dir> <dst_dir> <K>
"""
import sys
import random
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.dataset as ds
import os

OFF = 1 << 24  # key offset per replica, far above every sf0.1 key domain

KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY = ["region", "nation"]


def shuffle_text(text: str, seed: str) -> str:
    words = text.split(" ")
    random.Random(seed).shuffle(words)
    return " ".join(words)


def main(src: str, dst: str, k: int) -> None:
    os.makedirs(dst, exist_ok=True)
    # multi-file layout (16 parts per keyed table): a single file under
    # maxPartitionBytes is ONE scan partition — an unrealistic layout
    # that serializes every stage with no downstream exchange and
    # poisons the core-scaling measurement this fixture exists for
    nparts = 16

    def write_parts(tab, path):
        os.makedirs(path, exist_ok=True)
        n = tab.num_rows
        step = (n + nparts - 1) // nparts
        for i in range(nparts):
            sl = tab.slice(i * step, step)
            if sl.num_rows:
                pq.write_table(sl, f"{path}/part-{i}.parquet")

    for t in COPY:
        tab = ds.dataset(f"{src}/{t}.parquet").to_table()
        os.makedirs(f"{dst}/{t}.parquet", exist_ok=True)
        pq.write_table(tab, f"{dst}/{t}.parquet/part-0.parquet")
        print(t, tab.num_rows)
    for t, keys in KEYED.items():
        tab = ds.dataset(f"{src}/{t}.parquet").to_table()
        reps = []
        for i in range(k):
            cols = {}
            for name in tab.column_names:
                col = tab.column(name)
                if name in keys and i > 0:
                    col = pa.compute.add(col, i * OFF)
                elif t == "documents" and name == "text" and i > 0:
                    ids = tab.column("doc_id").to_pylist()
                    col = pa.array(
                        [shuffle_text(s, f"{i}:{d}") if s is not None else None
                         for s, d in zip(col.to_pylist(), ids)],
                        type=col.type)
                elif t == "embeddings" and name == "embedding" and i > 0:
                    col = pa.array(
                        [v[i % len(v):] + v[:i % len(v)]
                         if v is not None else None
                         for v in col.to_pylist()], type=col.type)
                cols[name] = col
            reps.append(pa.table(cols, schema=tab.schema))
        out = pa.concat_tables(reps)
        write_parts(out, f"{dst}/{t}.parquet")
        print(t, tab.num_rows, "->", out.num_rows)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
