"""Streaming near-dup gate cost comparison: plain re-read vs indexed
(bands-only hybrid) vs indexed (bucket-pruned arrays, the default) vs
pruned with in-line compaction (compact_every=2 — the fold fires after
batch 1, so batch 2's time is the post-compaction cost and the final
store counts must equal the plain pruned mode's).

Methodology (r5 protocol, r6 pruned form added): seed a store of N docs
(~40 random words each from a 40k-word vocab), then time THREE consecutive
100-doc availableNow batches per mode (90 novel docs + 10 near-dups of
stored docs) against the same seeded corpus state per mode. The seed is
written directly in each mode's on-disk layout (plain: bare parquet;
indexed: __gate_batch=-1 partitions + bucketed index paths — the exact
layout the gate itself writes, bucket expressions duplicated from
start_neardup_gate_sink_indexed). Reported per-batch seconds include the
availableNow stream start/stop overhead, identically for all modes.

Usage: python tools/gate_bench.py [N_docs ...]   (default: 50000 200000)
Prints one JSON line per (store_size, mode).
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mbgspark.operators.dedup import build_minhash_index
from mbgspark.session import get_spark
from mbgspark.streaming import (
    start_neardup_gate_sink,
    start_neardup_gate_sink_indexed,
    write_gate_meta,
)

BASE = "/tmp/gate_bench"
NUM_BUCKETS = 64


def make_texts(n: int, seed: int = 7) -> list[str]:
    rng = random.Random(seed)
    vocab = [
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(6))
        for _ in range(40_000)
    ]
    return [" ".join(rng.choice(vocab) for _ in range(40)) for _ in range(n)]


def batch_docs(texts: list[str], batch_no: int) -> list[dict]:
    rng = random.Random(1000 + batch_no)
    docs = []
    base_id = 10_000_000 + batch_no * 1000
    # 10 near-dups of stored docs: one word replaced
    for i in range(10):
        words = texts[rng.randrange(len(texts))].split()
        words[0] = "zzchanged"
        docs.append({"doc_id": base_id + i, "text": " ".join(words)})
    # 90 novel docs
    vocab_rng = random.Random(2000 + batch_no)
    for i in range(10, 100):
        words = [
            "".join(vocab_rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(6))
            for _ in range(40)
        ]
        docs.append({"doc_id": base_id + i, "text": " ".join(words)})
    return docs


def write_batch_file(src_dir: str, batch_no: int, docs: list[dict]) -> None:
    os.makedirs(src_dir, exist_ok=True)
    with open(os.path.join(src_dir, f"b{batch_no}.json"), "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")


def seed_mode(spark, texts: list[str], mode: str, root: str) -> None:
    docs = spark.createDataFrame(
        list(zip(range(len(texts)), texts)), "doc_id long, text string"
    ).repartition(32)
    store = f"{root}/store"
    if mode == "plain":
        docs.write.mode("overwrite").parquet(store)
        return
    # indexed layouts: __gate_batch=-1 so a fresh checkpoint's batch 0
    # (filter __gate_batch < 0) still sees the seed
    docs.withColumn("__gate_batch", F.lit(-1)).write.mode("overwrite").partitionBy(
        "__gate_batch"
    ).parquet(store)
    bands, arrays = build_minhash_index(docs, "doc_id", "text")
    (
        bands.withColumn("__gate_batch", F.lit(-1))
        .withColumn(
            "__bucket", F.pmod(F.xxhash64("band_idx", "band_key"), F.lit(NUM_BUCKETS))
        )
        .repartition(F.col("__bucket"))  # ~1 file per bucket dir
        .write.mode("overwrite")
        .partitionBy("__gate_batch", "__bucket")
        .parquet(f"{root}/index/bands")
    )
    if mode.startswith("pruned"):
        (
            arrays.withColumn("__gate_batch", F.lit(-1))
            .withColumn("__bucket", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(NUM_BUCKETS)))
            .repartition(F.col("__bucket"))
            .write.mode("overwrite")
            .partitionBy("__gate_batch", "__bucket")
            .parquet(f"{root}/index/arrays")
        )
    # the gate validates the seeded layout against the index meta sidecar
    # (r7: a bucketed store without meta is treated as un-migratable legacy)
    write_gate_meta(
        spark,
        f"{root}/index",
        {
            "layout": "bucketed-v1",
            "num_buckets": NUM_BUCKETS,
            "index_arrays": mode.startswith("pruned"),
        },
    )


def run_mode(spark, texts: list[str], mode: str, n: int) -> dict:
    root = f"{BASE}/{mode}_{n}"
    shutil.rmtree(root, ignore_errors=True)
    seed_mode(spark, texts, mode, root)
    times = []
    admitted = []
    for b in range(3):
        write_batch_file(f"{root}/src", b, batch_docs(texts, b))
        stream = spark.readStream.schema("doc_id long, text string").json(
            f"{root}/src"
        )
        t0 = time.time()
        if mode == "plain":
            q = start_neardup_gate_sink(
                stream, f"{root}/store", f"{root}/ck", threshold=0.5,
                available_now=True,
            )
        else:
            q = start_neardup_gate_sink_indexed(
                stream, f"{root}/store", f"{root}/index", f"{root}/ck",
                threshold=0.5, available_now=True,
                index_arrays=mode.startswith("pruned"), num_buckets=NUM_BUCKETS,
                # the compact mode folds mid-stream after 2 live batch
                # partitions accumulate — batch 2's time is then the
                # post-compaction cost of record (VERDICT r6 item 3)
                compact_every=2 if mode == "pruned_compact" else None,
            )
        q.awaitTermination(600)
        times.append(round(time.time() - t0, 2))
        admitted.append(spark.read.parquet(f"{root}/store").count())
    return {"mode": mode, "store_n": n, "batch_secs": times, "store_counts": admitted}


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [50_000, 200_000]
    spark = get_spark("gate_bench")
    spark.sparkContext.setLogLevel("ERROR")
    for n in sizes:
        texts = make_texts(n)
        for mode in ("plain", "hybrid", "pruned", "pruned_compact"):
            print(json.dumps(run_mode(spark, texts, mode, n)), flush=True)


if __name__ == "__main__":
    main()
