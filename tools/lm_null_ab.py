"""A/B: the vectorized bigram null-id fold's cost (VERDICT r9 item 6).

The r9 null-id correctness fix added a second branch to
``bigram_surprise(strategy="vectorized")``: an isNull-filtered scan →
mapInPandas partial sums → ONE pinned SinglePartition fold. The r9
driver bench moved +0.13 s on the (null-free) sf0.1 corpus and the
verdict wants the attribution CONFIRMED: is the branch a flat
scheduling-floor cost (the isNull filter prunes every row group via
parquet null_count stats, so the scan itself is ~free), and does it
stay flat as the corpus grows — or does it scale with data, in which
case the fold must merge into the existing partial-agg pass?

Protocol: for each SF dir given, time the vectorized strategy best-of-N
(noop sink, warmed at sf0.001 — bench.py's protocol) on
  (a) the corpus's own documents table (null-free doc_ids), and
  (b) a twin with 20% of doc_ids nulled (written once to /tmp, same
      text bytes — the model-build half of the plan is identical, so
      the pair isolates the null branch's data-dependent cost).

Usage: python tools/lm_null_ab.py [runs=3] [sf_dir ...=/tmp/sf1 /tmp/sf3]
Prints one JSON line: per-SF {null_free, null_heavy, delta} seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mbgspark.operators.textstats import bigram_surprise
from mbgspark.session import get_spark

NULL_FRAC = 0.2


def nulled_twin(src_dir: str) -> str:
    """documents.parquet with every 5th doc_id nulled (deterministic row
    parity), same text bytes, written under /tmp once."""
    out_dir = "/tmp/lm_null_ab/" + os.path.basename(src_dir.rstrip("/"))
    out = f"{out_dir}/documents.parquet"
    if os.path.exists(out):
        return out
    os.makedirs(out_dir, exist_ok=True)
    tbl = pq.read_table(f"{src_dir}/documents.parquet")
    ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
    mask = np.arange(len(ids)) % int(1 / NULL_FRAC) == 0
    col = pa.array(ids, mask=mask, type=pa.int64())  # masked -> null
    tbl = tbl.set_column(tbl.schema.get_field_index("doc_id"), "doc_id", col)
    pq.write_table(tbl, out)
    return out


def timed(spark, path: str) -> float:
    df = spark.read.parquet(path).select("doc_id", "text")
    t0 = time.time()
    bigram_surprise(df, strategy="vectorized").write.format("noop").mode(
        "overwrite"
    ).save()
    return time.time() - t0


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dirs = sys.argv[2:] or ["/tmp/sf1", "/tmp/sf3"]
    spark = get_spark("lm_null_ab")
    spark.sparkContext.setLogLevel("ERROR")
    # warm codegen/JIT at the smallest SF on both shapes
    warm_free = "/root/testdata/sf0.001/documents.parquet"
    warm_heavy = nulled_twin("/root/testdata/sf0.001")
    for p in (warm_free, warm_heavy):
        timed(spark, p)

    out: dict[str, dict] = {}
    for sf_dir in sf_dirs:
        heavy = nulled_twin(sf_dir)
        free_t, heavy_t = [], []
        # interleaved A/B: window noise hits both sides equally
        for _ in range(runs):
            free_t.append(timed(spark, f"{sf_dir}/documents.parquet"))
            heavy_t.append(timed(spark, heavy))
        nf, nh = round(min(free_t), 3), round(min(heavy_t), 3)
        out[sf_dir] = {
            "null_free": nf,
            "null_heavy": nh,
            "delta": round(nh - nf, 3),
            "all_free": [round(t, 3) for t in free_t],
            "all_heavy": [round(t, 3) for t in heavy_t],
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
