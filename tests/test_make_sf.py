"""Pins for the scale-corpus generator (tools/make_sf1.py) — the ladder
itself is test-worthy since r9, when lifting the copy cap exposed that
the roll-only embedding transform CYCLES at the embedding dim (64):
copies k and k+64 were bit-identical, planting artificial exact-dup
embedding mass in every sf10 measurement. These tests run pure
pyarrow/numpy — no Spark session."""

import os
import sys

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from make_sf1 import copy_table  # noqa: E402


def _embeddings_table(n=8, dim=64):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(n, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], type=pa.list_(pa.float32())
            ),
        }
    )


def _vecs(tbl):
    return [np.asarray(v) for v in tbl.column("embedding").to_pylist()]


def test_embedding_copies_do_not_cycle_at_dim():
    """The r9 regression pin: copy k=64 must NOT reproduce copy k=0 (the
    roll-only construction did exactly that), and in general every
    sampled copy pair must stay far from cosine 1 — the construction's
    no-artificial-near-dup-mass guarantee."""
    base = _embeddings_table()
    base_vecs = _vecs(base)
    copies = {k: _vecs(copy_table(base, "embeddings", k)) for k in (1, 32, 64, 65, 128)}
    for k, vs in copies.items():
        for b, v in zip(base_vecs, vs):
            cos = float(b @ v / (np.linalg.norm(b) * np.linalg.norm(v)))
            assert abs(cos) < 0.9, f"copy {k} too close to base: cos={cos}"
            # norm preserved by roll + sign mask
            assert abs(np.linalg.norm(v) - np.linalg.norm(b)) < 1e-5
    # the dim-64 cycle specifically: k=64 differs from k=0 and from k=128
    for b, v64, v128 in zip(base_vecs, copies[64], copies[128]):
        assert not np.allclose(b, v64), "k=64 cycled back to base"
        assert not np.allclose(v64, v128), "k=64 and k=128 identical"


def test_embedding_copy_transform_is_deterministic():
    """Same (table, k) → bit-identical output: the corpora must be
    reproducible across rebuilds (they live in /tmp and are wiped on
    reboot; parity history depends on regeneration being exact)."""
    base = _embeddings_table()
    a = _vecs(copy_table(base, "embeddings", 9))
    b = _vecs(copy_table(base, "embeddings", 9))
    for x, y in zip(a, b):
        assert np.array_equal(x, y)


def test_doc_stride_keeps_ids_under_planted_floor():
    """199 copies at the 5k stride must keep every shifted doc id under
    the 1e6 planted-id floor the bounded catalog queries key on."""
    docs = pa.table(
        {
            "doc_id": pa.array([0, 4999], type=pa.int64()),
            "text": pa.array(["a b", "c d"]),
        }
    )
    out = copy_table(docs, "documents", 199, doc_stride=5_000)
    ids = out.column("doc_id").to_pylist()
    assert max(ids) == 999_999 and min(ids) == 995_000
    # and the words are suffix-tagged so copies share no shingles
    assert out.column("text").to_pylist()[0] == "ax199 bx199"
