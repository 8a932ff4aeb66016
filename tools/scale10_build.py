"""Build a key-remapped 10x copy of a testdata sf dir (default sf0.1).

Usage: python tools/scale10_build.py [src_sf_dir] [dest_dir]

Why remapping: naive union-x10 duplicates every key on both sides of
every join, multiplying matches 100x — the scaled run would measure a
different (quadratically larger) workload. Each copy i instead offsets
all entity keys by i*OFFSET, so joins match within a copy and the
workload scales linearly, like real data growth. Dimension tables
(nation, region) stay single-copy: 10x the customers still live in 25
nations, which is exactly how real scale-up behaves.

Documents get every token PREFIXED with a per-copy tag (copy 0 keeps
the original text): an appended salt token is not enough — two copies
of a 20-token document with different salts still share 20/22 tokens
(Jaccard 0.91), so every near-dup group becomes a 10x group and the
dedup pair space grows 100x (measured: q_dedup_ngram_jaccard went
1.5s -> 225s, DuckDB 0.95s -> 94s — both engines drowning in the same
quadratic workload). Prefixing makes copies token-disjoint, which is
the realistic model (new data is new content): blocks still mix
copies but produce no cross-copy candidate pairs, and the workload
scales linearly.

pyarrow end-to-end so raw physical schemas survive byte-for-byte —
notably events.ts stays TIMESTAMP_NANOS, which catalog.load_table
specifically handles (a Spark rewrite would silently downgrade it to
micros and change the read path being benchmarked).
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

COPIES = 10
OFFSET = 10_000_000_000  # far above any sf<=1 key domain

# key columns to offset per copy, per table
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
SINGLE_COPY = ["nation", "region"]


def scale_table(src: str, dst: str, name: str) -> int:
    tbl = pq.read_table(src)
    if name in SINGLE_COPY:
        pq.write_table(tbl, dst)
        return tbl.num_rows
    copies = []
    for i in range(COPIES):
        t = tbl
        for col in KEYS.get(name, []):
            idx = t.schema.get_field_index(col)
            field = t.schema.field(idx)
            shifted = pc.add(t.column(col), pa.scalar(i * OFFSET, type=field.type))
            t = t.set_column(idx, field, shifted)
        if name == "documents" and i > 0:
            idx = t.schema.get_field_index("text")
            col = t.column("text").combine_chunks()
            tag = f"c{i}·"
            prefixed = pc.binary_join_element_wise(
                pa.scalar(tag),
                pc.replace_substring(col, " ", f" {tag}"),
                "",
            )
            t = t.set_column(idx, t.schema.field(idx), prefixed)
        copies.append(t)
    out = pa.concat_tables(copies)
    pq.write_table(out, dst)
    return out.num_rows


def main() -> int:
    src_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dest_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale10/sf1.0"
    marker = os.path.join(dest_dir, "_BUILT")
    if os.path.exists(marker):
        print(f"already built: {dest_dir}")
        return 0
    os.makedirs(dest_dir, exist_ok=True)
    for name in list(KEYS) + SINGLE_COPY:
        n = scale_table(
            os.path.join(src_dir, f"{name}.parquet"),
            os.path.join(dest_dir, f"{name}.parquet"),
            name,
        )
        print(f"  {name}: {n} rows")
    with open(marker, "w") as fh:
        fh.write(f"src={src_dir} copies={COPIES} offset={OFFSET}\n")
    print(f"built: {dest_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
