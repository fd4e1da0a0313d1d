"""Shuffle-volume audit: run flagship queries and report MEASURED shuffle
write bytes/records per query from Spark's stages API — the ground truth
behind every "minimize shuffles" plan claim. A plan shape says a shuffle
exists; this says how many bytes actually crossed it, which is what decides
wall-clock at 100 TB (a 100-byte-per-row shuffle and a 10 KB-per-row
shuffle have the same plan shape and a 100x different cluster bill).

Usage: SPARK_GRAFT_UI=true python tools/shuffle_audit.py [sf_dir] [query ...]
Prints one line per query plus a JSON summary. Requires the UI (REST API).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_UI", "true")

from mbgspark.plans.catalog import CATALOG
from mbgspark.session import get_spark

DEFAULT = [
    "q1", "q12", "pricing_summary", "dedup_exact", "dedup_minhash_lsh",
    "lm_bigram_score", "quality_surprise", "tfidf_terms", "bm25_topk",
    "contamination_check", "gopher_quality", "corpus_shuffle_shards",
    "sequence_packing", "ann_ivf_topk", "weighted_sample_docs",
    "split_leakage_counts", "count_min_user_events", "user_features",
]


def stage_totals(ui: str) -> tuple[int, int, int]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages")
    )
    wb = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    wr = sum(s.get("shuffleWriteRecords", 0) for s in stages)
    n = len(stages)
    return wb, wr, n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT
    spark = get_spark("shuffle-audit")
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        raise SystemExit("UI disabled — run with SPARK_GRAFT_UI=true")
    results: dict[str, dict] = {}
    for name in names:
        before_b, before_r, _ = stage_totals(ui)
        t0 = time.time()
        CATALOG[name][0](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.time() - t0
        after_b, after_r, n_stages = stage_totals(ui)
        results[name] = {
            "shuffle_mb": round((after_b - before_b) / 1e6, 2),
            "shuffle_rows": after_r - before_r,
            "sec": round(dt, 2),
        }
        r = results[name]
        print(
            f"{name:28s} {r['shuffle_mb']:10.2f} MB "
            f"{r['shuffle_rows']:>12,} rows  {r['sec']:6.2f}s"
        )
    print(json.dumps({"sf_dir": sf_dir, "queries": results}))


if __name__ == "__main__":
    main()
