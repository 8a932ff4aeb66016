"""Build a key-remapped Nx copy of a testdata sf dir (default 10x of sf0.1).

Usage: python tools/scale_build.py [copies] [src_sf_dir] [dest_dir]

    python tools/scale_build.py            # 10x  -> .scale10/sf1.0
    python tools/scale_build.py 100        # 100x -> .scale100/sf10.0

Why remapping: naive union-xN duplicates every key on both sides of
every join, multiplying matches Nx — the scaled run would measure a
different (quadratically larger) workload. Each copy i instead offsets
all entity keys by i*OFFSET, so joins match within a copy and the
workload scales linearly, like real data growth. Dimension tables
(nation, region) stay single-copy: Nx the customers still live in 25
nations, which is exactly how real scale-up behaves.

Documents get every token PREFIXED with a per-copy tag (copy 0 keeps
the original text): an appended salt token is not enough — two copies
of a 20-token document with different salts still share 20/22 tokens
(Jaccard 0.91), so every near-dup group becomes an Nx group and the
dedup pair space grows N^2x (measured at 10x: q_dedup_ngram_jaccard
went 1.5s -> 225s, DuckDB 0.95s -> 94s — both engines drowning in the
same quadratic workload). Prefixing makes copies token-disjoint, which
is the realistic model (new data is new content): blocks still mix
copies but produce no cross-copy candidate pairs, and the workload
scales linearly.

pyarrow end-to-end so raw physical schemas survive byte-for-byte —
notably events.ts stays TIMESTAMP_NANOS, which catalog.load_table
specifically handles (a Spark rewrite would silently downgrade it to
micros and change the read path being benchmarked).

Copies are written INCREMENTALLY (one ParquetWriter, one row group
batch per copy) so peak memory is one copy, not N — this is what makes
the 100x build (60M lineitem rows) fit comfortably.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFFSET = 10_000_000_000  # far above any sf<=1 key domain; 1000 copies fit int64
VALUE_OFFSET = 1000  # events.value domain is [0, ~561): per-copy windows are disjoint

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


def scale_table(src: str, dst: str, name: str, copies: int) -> int:
    tbl = pq.read_table(src)
    if name in SINGLE_COPY:
        pq.write_table(tbl, dst)
        return tbl.num_rows
    rows = 0
    with pq.ParquetWriter(dst, tbl.schema) as writer:
        for i in range(copies):
            t = tbl
            for col in KEYS.get(name, []):
                idx = t.schema.get_field_index(col)
                field = t.schema.field(idx)
                shifted = pc.add(t.column(col), pa.scalar(i * OFFSET, type=field.type))
                t = t.set_column(idx, field, shifted)
            if name == "events" and i > 0:
                # Per-copy VALUE window (r12, VERDICT r11 #2): shift
                # copy i's values by i*VALUE_OFFSET so copies occupy
                # disjoint value ranges. Without this, N identical
                # value distributions densify every 0.05 band N-fold
                # and q_join_theta_range's candidate/output space grows
                # N^2 (measured: 2.26e9 result rows at 100x — a
                # different, quadratic workload, which kept the one
                # non-equi-join headline off the 100x perf board). The
                # shift is the "new data is new content" rule the
                # documents (token prefix) and embeddings (sphere
                # blend) already follow: band matches stay within-copy
                # and the theta workload scales LINEARLY like real
                # growth. Integer-thousand offsets keep 2-decimal cent
                # bucketing exact in both engines (same stored float64
                # read by Spark and the DuckDB twin).
                vidx = t.schema.get_field_index("value")
                vfield = t.schema.field(vidx)
                t = t.set_column(
                    vidx,
                    vfield,
                    pc.add(t.column("value"), pa.scalar(float(i * VALUE_OFFSET), type=vfield.type)),
                )
            if name == "embeddings" and i > 0:
                # Copies must be DISTINCT vectors, not duplicates: an
                # exact-duplicate embedding corpus makes every ANN
                # ground truth a tie-break among 100 identical rows
                # (recall measurements read ~0.1 noise regardless of
                # index quality — measured r9, the OPQ experiment's
                # first run). The source corpus is L2-NORMALIZED
                # (norm 1, per-dim std 0.125), so the blend happens ON
                # THE SPHERE: e' = normalize(0.8*e + 0.6*u) with u a
                # seeded unit-norm gaussian direction — cos(e', e)
                # ~0.8, sibling copies ~0.64, unrelated ~0, preserving
                # the corpus's unit-norm invariant while reshuffling
                # neighborhoods (the "new data is new content" rule
                # documents already follow via token prefixing).
                # Deterministic per copy.
                import numpy as np

                eidx = t.schema.get_field_index("embedding")
                arr = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
                rng = np.random.RandomState(1_000_003 * i + 17)
                g = rng.standard_normal(arr.shape)
                g /= np.linalg.norm(g, axis=1, keepdims=True)
                mixed = 0.8 * arr + 0.6 * g
                mixed /= np.linalg.norm(mixed, axis=1, keepdims=True)
                mixed = mixed.astype(np.float32)
                t = t.set_column(
                    eidx,
                    t.schema.field(eidx),
                    pa.array(mixed.tolist(), type=t.schema.field(eidx).type),
                )
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
                # keep text-derived metadata CONSISTENT with the
                # rewritten text: n_chars is length(text) in codepoints,
                # and prefixing made every document longer — a stale
                # column is a corpus bug (it broke the q_scan_text_lines
                # 100x fingerprint before this recompute existed)
                ncidx = t.schema.get_field_index("n_chars")
                if ncidx >= 0:
                    t = t.set_column(
                        ncidx,
                        t.schema.field(ncidx),
                        pc.cast(pc.utf8_length(prefixed), pa.int64()),
                    )
            writer.write_table(t)
            rows += t.num_rows
    return rows


def main() -> int:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    src_sf = float(src_dir.rstrip("/").rsplit("sf", 1)[-1])
    dest_dir = (
        sys.argv[3]
        if len(sys.argv) > 3
        else f"/root/repo/.scale{copies}/sf{src_sf * copies:g}"
    )
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
            copies,
        )
        print(f"  {name}: {n} rows", flush=True)
    with open(marker, "w") as fh:
        fh.write(f"src={src_dir} copies={copies} offset={OFFSET}\n")
    print(f"built: {dest_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
