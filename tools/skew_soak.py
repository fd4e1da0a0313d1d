"""Viral-text skew soak for the LSH bucket cap (VERDICT r8 item 5).

The ``max_bucket_size`` guard in ``lsh_candidate_pairs`` is the 100 TB
safety valve — a text near-duplicated N times lands N rows in the same
band buckets and the self-join mints ~N²/2 pairs per band — but through
r8 it had only been exercised on synthetic-uniform corpora plus unit
tests. This soak builds the adversarial shape at a real SF and measures
the guard end-to-end:

1. corpus = the sf documents table + a VIRAL block of ``viral`` rows,
   each a one-word deterministic mutation of one base text (Jaccard
   ~0.9+ to every sibling — a NEAR-dup mega-cluster, i.e. the case
   exact dedup upstream cannot absorb and the cap exists for);
2. capped run: full ``minhash_near_dups`` (shingle → signature → banded
   join with the cap → exact verify) with ``metrics_out`` — asserts the
   pipeline completes with BOUNDED pairs and that the drop is visible
   through the observed channel (oversized_buckets > 0,
   oversized_rows ≈ viral × bands), not silent;
3. uncapped run (optional, ``--uncapped``): candidate-pair COUNT only
   with ``max_bucket_size=None`` — measures the pair explosion the cap
   prevents (~viral²/2 pairs; at viral=10⁴ that is ~5×10⁷ candidates
   before verify even starts).

Every phase prints one JSON line (gate_soak convention). Viral doc ids
start at 5_000_000 — above the 1e6 planted-id space and every strided
copy, so the block never collides with catalog constructions.

Usage: python tools/skew_soak.py [sf_dir=/tmp/sf1] [viral=10000] [--uncapped]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_WORDS = (
    "pemerintah daerah meninjau pelaksanaan program makan bergizi gratis "
    "di sekolah dasar bersama dinas pendidikan dan dinas kesehatan "
    "kabupaten untuk memastikan distribusi paket makanan sehat berjalan "
    "lancar setiap hari bagi seluruh siswa penerima manfaat program"
).split()

VIRAL_ID_BASE = 5_000_000


def viral_rows(n: int) -> list[tuple[int, str]]:
    """n near-identical texts: row i swaps ONE word for a fresh token.
    Deterministic; pairwise shingle-Jaccard stays high (one word touches
    ≤3 of ~len(BASE_WORDS) 3-shingles), so LSH banding puts essentially
    the whole block in shared buckets — the mega-cluster shape."""
    out = []
    for i in range(n):
        w = list(BASE_WORDS)
        w[i % len(w)] = f"viral{i}"
        out.append((VIRAL_ID_BASE + i, " ".join(w)))
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    viral = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    uncapped = "--uncapped" in sys.argv

    from mbgspark.io import load_table
    from mbgspark.session import get_spark
    from mbgspark.operators import dedup

    spark = get_spark("skew_soak")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    extra = spark.createDataFrame(viral_rows(viral), "doc_id bigint, text string")
    corpus = docs.unionByName(extra)
    base_n = docs.count()
    print(json.dumps({"phase": "corpus", "base_rows": base_n, "viral_rows": viral}))

    # -- capped end-to-end: the production path --
    metrics: list = []
    t0 = time.time()
    dups = dedup.minhash_near_dups(
        corpus, "doc_id", "text", max_bucket_size=1000, metrics_out=metrics
    )
    n_pairs = dups.count()
    capped_secs = round(time.time() - t0, 2)
    m = metrics[0].first().asDict()
    print(
        json.dumps(
            {
                "phase": "capped",
                "secs": capped_secs,
                "verified_pairs": n_pairs,
                "oversized_buckets": m["oversized_buckets"],
                "oversized_rows": m["oversized_rows"],
            }
        )
    )
    # the guard must actually have fired and must be observable
    assert m["oversized_buckets"] > 0, "viral block did not trip the cap"
    assert m["oversized_rows"] >= viral, m  # the block rows, ≥1 band each
    # bounded output: no pair source bucket exceeded the cap, so the
    # verified pairs are at most corpus-background + sub-cap leakage —
    # orders of magnitude under viral²/2
    assert n_pairs < viral * viral // 8, f"pair explosion: {n_pairs}"

    # -- uncapped candidate count: what the cap prevents --
    if uncapped:
        shingled = dedup.with_word_shingles(corpus, "doc_id", "text", 3)
        sig = dedup.minhash_signature(shingled, "doc_id")
        t1 = time.time()
        n_cand = dedup.lsh_candidate_pairs(
            sig, "doc_id", max_bucket_size=None
        ).count()
        print(
            json.dumps(
                {
                    "phase": "uncapped",
                    "secs": round(time.time() - t1, 2),
                    "candidate_pairs": n_cand,
                    "viral_floor": viral * (viral - 1) // 2,
                }
            )
        )


if __name__ == "__main__":
    main()
