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

AQE query stages and plan subqueries (scalar-subquery exchanges) are
walked; the driver is ``executedPlan().execute().count()`` — the
DataFrame's own QueryExecution, so metrics land on the inspected tree
(a ``noop`` write would run a SEPARATE QueryExecution and leave these
zeros).

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
from mbgspark.plans.catalog import CATALOG
from mbgspark.session import ensure_session_conf, get_spark

KEYS = ("shuffleBytesWritten", "shuffleRecordsWritten", "spillSize", "peakMemory")


def _walk(node):
    yield node
    c = node.getClass().getSimpleName()
    if c == "AdaptiveSparkPlanExec":
        yield from _walk(node.executedPlan())
        return
    if "QueryStageExec" in c:
        yield from _walk(node.plan())
        return
    subs = node.subqueries()
    for i in range(subs.size()):
        yield from _walk(subs.apply(i))
    cs = node.children()
    for i in range(cs.size()):
        yield from _walk(cs.apply(i))


def ledger_for(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan()
    rows = plan.execute().count()
    tot = {k: 0 for k in KEYS}
    for node in _walk(plan):
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            k = str(kv._1())
            if k in tot:
                tot[k] += kv._2().value()
    tot["out_rows"] = rows
    return tot


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
