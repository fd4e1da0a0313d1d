"""Snapshot .explain('formatted') for named catalog rows into plans/r15/.

Usage: python tools/plan_snapshot.py SUFFIX NAME [NAME...]
Writes plans/r15/<name>_<SUFFIX>.txt (the optimization-round evidence
contract: judges check plan claims against these files).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mbgspark.plans.catalog import CATALOG
from mbgspark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    unknown = [n for n in names if n not in CATALOG]
    if unknown:
        sys.exit(f"not in CATALOG: {unknown}")
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("plan_snapshot")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = CATALOG[name][0](spark, SF)
        # public API only (the jvmseam confinement pin): explain() prints,
        # so capture its stdout instead of reaching into queryExecution
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        txt = buf.getvalue()
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {SF} ({suffix})\n")
            f.write(txt)
        print(path)


if __name__ == "__main__":
    main()
