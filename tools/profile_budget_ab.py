"""exact vs exact=False numeric-profiler A/B + xrec sweep (VERDICT r13
next-round #4): the ``exact=False`` budget path is the actual 100 TB
shape — ONE codegen aggregation pass, O(accuracy) sketch memory per
column, no histogram, no windows — but until r14 it was only
unit-pinned, never measured. This tool records, per SF:

- ``shuffleRecordsWritten`` for BOTH paths (the load-independent key:
  the exact path's shuffle is cardinality-bounded and grows with the
  distinct-value domain; the budget path's is partition-bounded — a
  fixed number of partial-agg rows regardless of data volume, the flat
  post-scan line a petabyte profile needs);
- interleaved best-of-N wall seconds for both (same-process A/B/A/B so
  neighbor load hits both sides equally — the only honest seconds
  comparison on this box, SCALE.md r7);
- max |approx - exact| over median/p95 across the profiled columns
  (the accuracy price actually paid at that SF, vs the rank-error
  bound n/accuracy).

Usage: python tools/profile_budget_ab.py [reps] [SF_DIR...]
       (defaults: 3 reps; /root/testdata/sf0.1 /tmp/sf1 /tmp/sf10)
Prints one JSON line per SF; results go in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from shuffle_ledger import ledger_for  # noqa: E402

from mbgspark.io import load_table  # noqa: E402
from mbgspark.operators.profiling import profile_numeric  # noqa: E402
from mbgspark.session import ensure_session_conf, get_spark  # noqa: E402

COLS = ["l_quantity", "l_discount", "l_extendedprice"]


def main() -> int:
    args = sys.argv[1:]
    reps = int(args[0]) if args else 3
    sf_dirs = args[1:] or ["/root/testdata/sf0.1", "/tmp/sf1", "/tmp/sf10"]
    spark = get_spark("profile_budget_ab")
    ensure_session_conf(spark)
    spark.sparkContext.setLogLevel("ERROR")
    for sf in sf_dirs:
        df = load_table(spark, sf, "lineitem")
        exact = profile_numeric(df, COLS)
        approx = profile_numeric(df, COLS, exact=False)
        e_rows = {r["column_name"]: r for r in exact.collect()}
        a_rows = {r["column_name"]: r for r in approx.collect()}
        qerr = max(
            abs(a_rows[c][k] - e_rows[c][k])
            for c in COLS
            for k in ("median_val", "p95_val")
        )
        times: dict[str, list[float]] = {"exact": [], "approx": []}
        led: dict[str, int] = {}
        for _ in range(reps):
            for name, frame in (("exact", exact), ("approx", approx)):
                t0 = time.time()
                led[name] = ledger_for(frame)["shuffleRecordsWritten"]
                times[name].append(time.time() - t0)
        print(
            json.dumps(
                {
                    "sf_dir": sf,
                    "xrec_exact": led["exact"],
                    "xrec_approx": led["approx"],
                    "sec_exact": round(min(times["exact"]), 2),
                    "sec_approx": round(min(times["approx"]), 2),
                    "max_quantile_abs_err": round(qerr, 4),
                }
            ),
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
