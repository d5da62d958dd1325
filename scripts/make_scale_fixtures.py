#!/usr/bin/env python
"""Deterministic ×N replication of the sf0.1 fixtures into a local
``sf1``-style directory — the input generator for the scale sweep
(``scripts/scale_sweep.py``).

No RNG anywhere: replica k is the source table with every key column
offset by ``k * stride`` (strides sit far above any real id, so replicas
can never collide and every intra-replica FK survives verbatim).
Dimension tables (region, nation) are NOT replicated — dims don't grow
with fact volume, and replicating them would break the unchanged
``c_nationkey``/``s_nationkey`` FKs.

Payload columns are copied byte-for-byte. That is deliberate for
``documents``/``embeddings``: ×10 exact copies turn every near-dup
cluster into a 10×-larger one, which is precisely the stress the dedup
pair generators + connected components need to cross the driver-regime
gate onto the distributed path (VERDICT r2 task 1).

Output layout: ``{out}/{table}.parquet/part-{k:02d}.parquet`` — a
directory per table, one file per replica, so Spark gets ≥N input splits
per scan without any repartitioning.
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# per-table {column: stride}; strides are ≥100× above any id the
# generator emits at sf≤1 so replica id-spaces never overlap
KEY_STRIDES: dict[str, dict[str, int]] = {
    "customer": {"c_custkey": 10_000_000},
    "orders": {"o_orderkey": 100_000_000, "o_custkey": 10_000_000},
    "lineitem": {
        "l_orderkey": 100_000_000,
        "l_partkey": 10_000_000,
        "l_suppkey": 1_000_000,
    },
    "part": {"p_partkey": 10_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "events": {"event_id": 1_000_000_000, "user_id": 100_000_000},
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 10_000_000},
}
DIM_TABLES = ("region", "nation")
MARKER = "SCALE_FIXTURES_OK"


def replicate_table(src_path: str, out_dir: str, strides: dict[str, int], n: int) -> int:
    table = pq.read_table(src_path)
    os.makedirs(out_dir, exist_ok=True)
    for k in range(n):
        if k == 0:
            rep = table
        else:
            cols = []
            for name in table.column_names:
                col = table.column(name)
                if name in strides:
                    col = pc.add(col, pa.scalar(k * strides[name], type=col.type))
                cols.append(col)
            rep = pa.table(dict(zip(table.column_names, cols)))
        pq.write_table(rep, os.path.join(out_dir, f"part-{k:02d}.parquet"))
    return table.num_rows * n


def build(src_dir: str, out_dir: str, n: int = 10) -> None:
    marker = os.path.join(out_dir, MARKER)
    stamp = f"src={src_dir} n={n} v=1"
    if os.path.exists(marker) and open(marker).read().strip() == stamp:
        print(f"fixtures up to date at {out_dir}", file=sys.stderr)
        return
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    for t, strides in KEY_STRIDES.items():
        rows = replicate_table(
            os.path.join(src_dir, f"{t}.parquet"),
            os.path.join(out_dir, f"{t}.parquet"),
            strides,
            n,
        )
        print(f"{t}: {rows} rows ({n} replicas)", file=sys.stderr)
    for t in DIM_TABLES:
        shutil.copy(
            os.path.join(src_dir, f"{t}.parquet"),
            os.path.join(out_dir, f"{t}.parquet"),
        )
    with open(marker, "w") as f:
        f.write(stamp)


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale/sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    build(src, out, n)
