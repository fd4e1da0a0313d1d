"""Shuffle-bytes ledger — a load-independent regression instrument.

Every bench adjudication this repo has done (r7 window-noise evidence,
r9 q12 drift, r11 drifter A/B) fought the same confound: SECONDS vary
2-3x with invisible neighbor load, while the work a plan does is fixed.
This tool records the work itself: for each named catalog row it drives
the query's own executed plan and sums the executed-plan metrics that
are deterministic for a given (plan, data) pair —

- ``shuffleRecordsWritten``: exactly reproducible run-to-run;
- ``shuffleBytesWritten``: stable modulo compression framing (<1%);
- ``spillSize``: memory-discipline invariant — expected 0 at bench SFs;
- ``peakMemory``: indicative only (sized by partition count), reported
  but not a regression key.

A future round that changes a plan and sees seconds move can diff THIS
ledger instead of re-litigating the window: bytes/records moved = the
plan really does different work; bytes flat + seconds up = load.

The metric walk lives in ``mbgspark.jvmseam.executed_plan_metrics``
(the one module allowed to touch JVM internals — the seam-confinement
pin test enforces it): AQE query stages and plan subqueries are walked,
and the driver is the DataFrame's OWN QueryExecution, so metrics land
on the inspected tree.

Usage: python tools/shuffle_ledger.py [SF_DIR] [NAME...]
       (defaults: /root/testdata/sf0.1, bench.py's HEADLINE set)
Prints one JSON line per query plus a totals line; exits 1 if any
query SPILLS (the suite-wide zero-spill invariant).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE
from mbgspark.jvmseam import executed_plan_metrics
from mbgspark.plans.catalog import CATALOG
from mbgspark.session import ensure_session_conf, get_spark

KEYS = ("shuffleBytesWritten", "shuffleRecordsWritten", "spillSize", "peakMemory")


def ledger_for(df) -> dict:
    return executed_plan_metrics(df, KEYS)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or list(HEADLINE)
    unknown = [n for n in names if n not in CATALOG]
    if unknown:
        sys.exit(f"shuffle_ledger: not in CATALOG: {unknown}")
    spark = get_spark("shuffle_ledger")
    ensure_session_conf(spark)
    spark.sparkContext.setLogLevel("ERROR")
    totals = {k: 0 for k in KEYS}
    spilled = []
    for name in names:
        df = CATALOG[name][0](spark, sf_dir)
        row = ledger_for(df)
        for k in KEYS:
            totals[k] += row[k]
        if row["spillSize"]:
            spilled.append(name)
        print(json.dumps({"query": name, **row}), flush=True)
    print(json.dumps({"query": "__total__", **totals, "spilled": spilled}))
    return 1 if spilled else 0


if __name__ == "__main__":
    raise SystemExit(main())
