"""Time arbitrary CATALOG rows (Spark + DuckDB oracle) at a given SF dir.

bench.py / bench_oracle.py are pinned to the driver's HEADLINE set; the
scale octaves (VERDICT r9 items 2-4: the r9-mask embedding baseline, the
key-skew octave, the split-layout sweep) need the same protocol on
NON-headline rows (ann_ivf_topk, label_centroids, jl_projection, ...).
This tool generalizes the pair: for each named catalog row it

- warms the Spark plan at sf0.001 (JIT/codegen, per bench.py's rationale),
  then times best-of-2 at the real SF with the noop sink (full compute,
  no collect cost) — byte-for-byte the bench.py measurement;
- warms + times the row's DuckDB oracle on the same parquet (per
  bench_oracle.py); rows with no SQL oracle report null.

Usage: python tools/row_bench.py [--spark-only] SF_DIR NAME [NAME...]
Prints one JSON line:
  {"sf_dir": ..., "spark": {name: s}, "oracle": {name: s|null},
   "spark_total": s, "oracle_total": s}

``--spark-only`` skips the oracle pass (all-null oracle columns): when
only Spark-side code changed against an UNCHANGED corpus, the prior
round's oracle column is still the measurement of record and re-paying
a 20-minute jl_projection oracle buys nothing (r11).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import ITERATIVE, run_one
from mbgspark.plans.catalog import CATALOG
from mbgspark.session import get_spark
from tools.parity import duck_connection

WARM_DIR = "/root/testdata/sf0.001"


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--spark-only"]
    spark_only = "--spark-only" in sys.argv[1:]
    if len(args) < 2:
        sys.exit("usage: row_bench.py [--spark-only] SF_DIR NAME [NAME...]")
    sf_dir = args[0]
    names = args[1:]
    unknown = [n for n in names if n not in CATALOG]
    if unknown:
        sys.exit(f"row_bench: not in CATALOG: {unknown}")

    spark = get_spark("row_bench")
    spark.sparkContext.setLogLevel("ERROR")
    missed_warm: list[str] = []
    for name in names:
        try:
            run_one(spark, name, WARM_DIR)
        except Exception as exc:
            # a failed warm run skews this row off bench.py's protocol —
            # only the FIRST timed run is cold (best-of-2 is still
            # reported, and the min is usually the warmed second run),
            # so the skew is bounded but real; say so AND mark the row
            # in the JSON so downstream readers see it (ADVICE r10/r11)
            print(
                f"row_bench: WARM RUN FAILED for {name} ({exc}); first "
                "timed run will be cold (best-of-2 still reported)"
            )
            missed_warm.append(name)
    spark_times: dict[str, float] = {}
    for name in names:
        spark_times[name] = round(min(run_one(spark, name, sf_dir) for _ in range(2)), 3)

    oracle_times: dict[str, float | None] = {name: None for name in names}
    con = None if spark_only else duck_connection(sf_dir)
    for name in [] if spark_only else names:
        sql = CATALOG[name][1]
        if sql is None:
            continue
        con.execute(sql).fetchall()  # warm (page cache + catalog)
        t0 = time.time()
        con.execute(sql).fetchall()
        oracle_times[name] = round(time.time() - t0, 3)

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "spark": spark_times,
                "oracle": oracle_times,
                "spark_total": round(sum(spark_times.values()), 3),
                "oracle_total": round(sum(v for v in oracle_times.values() if v), 3),
                "iterative_cold": sorted(set(names) & ITERATIVE),
                "missed_warm": missed_warm,
            }
        )
    )


if __name__ == "__main__":
    main()
