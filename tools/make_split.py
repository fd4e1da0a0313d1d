"""Re-shape a scale corpus into DIRECTORY tables (many part files).

At 100 TB a table is never one parquet file — it is thousands of parts
under a directory — yet every driver-shipped and make_sf1-built corpus
is single-file-per-table, so the many-files scan shape (file-granular
split planning, no row-group ceiling, per-file scheduling overhead) was
untested until r9. This tool rewrites each `{t}.parquet` FILE from a
source corpus as a `{t}.parquet/` DIRECTORY of row-sliced part files:
Spark reads either shape through the same `spark.read.parquet` call
(directory listing is native), and the parity oracle globs
`*.parquet` under a directory (tools/parity.py resolves per shape).

Parts default to 32 for fact tables and 1 for the dimension tables —
roughly the shape a 32-core scan wants; row-slice boundaries are
deterministic (equal slices, remainder on the last part).

Usage: python tools/make_split.py [src=/tmp/sf1] [dst=/tmp/sf1_split] [parts=32]
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from make_sf1 import DIMS, TABLES  # noqa: E402


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_split"
    parts = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    os.makedirs(dst, exist_ok=True)
    for name in TABLES:
        tbl = pq.read_table(f"{src}/{name}.parquet")
        n = parts if name not in DIMS else 1
        out_dir = f"{dst}/{name}.parquet"
        os.makedirs(out_dir, exist_ok=True)
        step = max(1, tbl.num_rows // n)
        written = 0
        for i in range(n):
            lo = i * step
            hi = tbl.num_rows if i == n - 1 else min((i + 1) * step, tbl.num_rows)
            if lo >= hi:
                break
            pq.write_table(tbl.slice(lo, hi - lo), f"{out_dir}/part-{i:05d}.parquet")
            written += 1
        print(f"{name}: {tbl.num_rows} rows -> {written} part files")


if __name__ == "__main__":
    main()
