"""Deterministic sf1 inflation of the driver's sf0.1 testdata (NOTES_r6:
the driver ships sf{0.001,0.01,0.1}; round 6's scale evidence needs one
decade more). 10 key-shifted copies of every fact table, written with
pyarrow so physical parquet types are preserved untouched.

Choices that keep the inflated data honest:
- ONE per-copy key stride per join family: 1e8 for the TPC-H/events
  keys, 1e4 for doc_id/vec_id — cross-table joins (doc_id ↔ vec_id,
  o_custkey ↔ c_custkey, …) hold within and across copies exactly as at
  sf0.1. The document stride must stay BELOW 1_000_000: several catalog
  queries bound their working subset by construction (`doc_id < K`,
  planted perturbed copies in the `doc_id + 1000000` id space), and a
  1e8-strided copy would land inside the planted-id branch, turning a
  ~300-doc bounded pair pipeline into a 45k-doc transitive closure that
  the DuckDB oracle cannot survive (measured: 53 GB RSS, killed).
  Copies at 1e4..9.5e4 stay outside every bound (all bounds are
  `< K ≤ 300` or `>= 1e6`), so bounded queries stay bounded — which is
  exactly their documented sf-independence.
- documents.text for copy k>0 maps every word w → w + "xk" (n_chars
  recomputed): within-copy duplicate/near-dup structure replicates
  exactly, but copies share NO shingles, so inflation adds no artificial
  cross-copy near-dup clusters (which would explode pair-query outputs
  quadratically instead of scaling them linearly).
- embeddings.embedding for copy k>0 is np.roll(vec, k) times a
  seeded-by-k Rademacher ±1 mask (deterministic): same norm and
  component distribution, near-zero cosine to the original AND to every
  other copy — no artificial cross-copy ANN/near-dup mass. The mask is
  the r9 fix for the roll-only construction's dim-64 CYCLE: at 99
  copies, roll(k) == roll(k-64), so copies 64..98 duplicated copies
  0..34's vectors exactly — artificial near-dup mass at sf10.
- region/nation are dimensions: copied once, unshifted.
- timestamps/dates/categories copy unchanged — per-day volumes scale
  10×, the same shape real TPC-H SF growth has.

Usage: python tools/make_sf1.py [out_dir] [copies]   (default /tmp/sf1, 10)

``copies`` extends the same construction to other SFs (r7 VERDICT item 4:
a third scale point past sf1) — e.g. ``/tmp/sf3 30`` builds a 3×-sf1
corpus. The document stride bounds ``copies``: the highest shifted base
doc id must stay below the 1e6 planted-id floor (asserted). Up to 99
copies the stride is the historical 10_000 (sf1/sf3/sf10 corpora
byte-identical to earlier rounds modulo the embedding-mask fix); above
99 the stride drops to 5_000 (base doc ids occupy [0, 5000), so copies
stay disjoint), lifting the ceiling to 199 ≈ sf20 (r8 VERDICT item 4).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
STRIDE = 100_000_000
DOC_STRIDE = 10_000
COPIES = 10

KEY_COLS = {
    "c_custkey", "s_suppkey", "p_partkey", "o_orderkey", "o_custkey",
    "l_orderkey", "l_partkey", "l_suppkey", "event_id", "user_id",
}
DOC_KEY_COLS = {"doc_id", "vec_id"}

DIMS = {"region", "nation"}
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def suffix_words(texts: list[str | None], k: int) -> list[str | None]:
    tag = f"x{k}"
    return [
        None if t is None else " ".join(w + tag for w in t.split())
        for t in texts
    ]


def copy_table(
    tbl: pa.Table, name: str, k: int, doc_stride: int = DOC_STRIDE
) -> pa.Table:
    if k == 0:
        return tbl
    arrays = []
    for i, field in enumerate(tbl.schema):
        col = tbl.column(i)
        if field.name in KEY_COLS:
            col = pc.add(col, pa.scalar(k * STRIDE, type=field.type))
        elif field.name in DOC_KEY_COLS:
            col = pc.add(col, pa.scalar(k * doc_stride, type=field.type))
        elif name == "documents" and field.name == "text":
            col = pa.chunked_array(
                [pa.array(suffix_words(col.to_pylist(), k), type=field.type)]
            )
        elif name == "embeddings" and field.name == "embedding":
            # roll-only cycles at the embedding dim (64); the seeded ±1
            # mask keeps every copy pair near-orthogonal at any k —
            # deterministic (seed = k), norm/distribution preserved
            mask = None
            rolled = []
            for v in col.to_pylist():
                if v is None:
                    rolled.append(None)
                    continue
                a = np.roll(np.asarray(v), k)
                if mask is None or len(mask) != len(a):
                    rng = np.random.default_rng(k)
                    mask = rng.integers(0, 2, len(a)) * 2 - 1
                rolled.append((a * mask).tolist())
            col = pa.chunked_array([pa.array(rolled, type=field.type)])
        arrays.append(col)
    out = pa.table(arrays, schema=tbl.schema)
    if name == "documents" and "n_chars" in tbl.schema.names:
        n = out.schema.get_field_index("n_chars")
        lens = pc.cast(
            pc.utf8_length(out.column("text")), tbl.schema.field("n_chars").type
        )
        out = out.set_column(n, tbl.schema.field("n_chars"), lens)
    return out


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    copies = int(sys.argv[2]) if len(sys.argv) > 2 else COPIES
    if not 1 <= copies <= 199:
        # stride 5000 × k=199 shifts the highest base doc id (<5000) to
        # 999,999 — the last value under the 1e6 planted-id floor every
        # bounded query keys on; k=200 would cross it and corrupt the
        # bounded-pair semantics.
        raise SystemExit(f"copies must be in [1, 199], got {copies}")
    # ≤99 copies keeps the historical 10k stride (sf1/sf3/sf10 corpora
    # reproduce earlier rounds' id layout); >99 needs the tighter 5k
    # stride (base doc ids occupy [0, 5000) — copies stay disjoint).
    doc_stride = DOC_STRIDE if copies <= 99 else 5_000
    os.makedirs(out_dir, exist_ok=True)
    for name in TABLES:
        tbl = pq.read_table(f"{SRC}/{name}.parquet")
        if name in DIMS:
            pq.write_table(tbl, f"{out_dir}/{name}.parquet")
            print(f"{name}: {tbl.num_rows} rows (dim, copied)")
            continue
        for col in DOC_KEY_COLS & set(tbl.schema.names):
            # the '(asserted)' claim in the module docstring: base ids
            # must fit under the stride (else copies collide) and the
            # highest shifted id must stay under the 1e6 planted-id
            # floor (else bounded queries absorb inflated copies).
            base_max = pc.max(tbl.column(col)).as_py()
            assert base_max < doc_stride, (
                f"{name}.{col} max base id {base_max} >= stride "
                f"{doc_stride}: copies would collide"
            )
            shifted_max = base_max + (copies - 1) * doc_stride
            assert shifted_max < 1_000_000, (
                f"{name}.{col} max shifted id {shifted_max} crosses the "
                f"1e6 planted-id floor"
            )
        parts = [copy_table(tbl, name, k, doc_stride) for k in range(copies)]
        big = pa.concat_tables(parts)
        pq.write_table(big, f"{out_dir}/{name}.parquet")
        print(f"{name}: {tbl.num_rows} -> {big.num_rows} rows")


if __name__ == "__main__":
    main()
