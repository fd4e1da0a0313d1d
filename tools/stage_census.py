"""Per-query stage census — the AQE-overhead instrument (VERDICT r14
items 1/7: dedup_minhash_lsh runs ~40 stages whose inter-stage gaps are
~40% of its sf0.1 wall; the r15 done-bar is a material stage-count drop).

For each named catalog row: run it once to warm (plan + JIT at the same
SF, per bench.py's protocol rationale), then run it again and report

- ``n_stages``: completed stages attributable to the timed run (retained
  AppStatusStore stage count diff — exact while the app stays under
  spark.ui.retainedStages, asserted via the jvmseam headroom guard);
- ``stage_sec``: sum of per-stage (completionTime − firstTaskLaunchedTime)
  — the time tasks were actually running;
- ``wall_sec``: the noop-sink wall. wall − stage_sec ≈ driver/AQE
  re-planning + scheduling gaps, the overhead this census exists to see.

Usage: python tools/stage_census.py SF_DIR NAME [NAME...]
Prints one JSON line per row.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mbgspark.jvmseam import _retained_stages, assert_stage_retention_headroom
from mbgspark.plans.catalog import CATALOG
from mbgspark.session import get_spark


def _stage_snapshot(spark) -> dict[int, float]:
    """{stageId: active_sec} for every retained completed stage."""
    out: dict[int, float] = {}
    for st in _retained_stages(spark):
        sid = int(st.stageId())
        try:
            t0 = st.firstTaskLaunchedTime()
            t1 = st.completionTime()
            if t0 is None or t1 is None:
                continue
            # java.util.Date via py4j in Option wrappers
            ms0 = t0.get().getTime() if hasattr(t0, "get") else t0.getTime()
            ms1 = t1.get().getTime() if hasattr(t1, "get") else t1.getTime()
            out[sid] = (ms1 - ms0) / 1000.0
        except Exception:
            out[sid] = 0.0
    return out


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    unknown = [n for n in names if n not in CATALOG]
    if unknown:
        sys.exit(f"not in CATALOG: {unknown}")
    spark = get_spark("stage_census")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        builder = CATALOG[name][0]
        spark.sparkContext.setJobDescription(f"census-warm: {name}")
        builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        before = _stage_snapshot(spark)
        spark.sparkContext.setJobDescription(f"census: {name}")
        t0 = time.time()
        builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        spark.sparkContext.setJobDescription(None)
        after = _stage_snapshot(spark)
        assert_stage_retention_headroom(spark)
        new = {sid: s for sid, s in after.items() if sid not in before}
        print(
            json.dumps(
                {
                    "name": name,
                    "n_stages": len(new),
                    "stage_sec": round(sum(new.values()), 3),
                    "wall_sec": round(wall, 3),
                }
            )
        )


if __name__ == "__main__":
    main()
