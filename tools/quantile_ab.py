"""Same-process interleaved A/B: builtin ``percentile`` vs the
histogram-pipeline exact quantiles (VERDICT r12 next-round #5 — the 15×
docstring claim, measured and recorded).

A = Spark builtin ``percentile(col, array(qs))`` per column — a
    TypedImperativeAggregate whose buffer is the full distinct-value→count
    map PER FUNCTION, serialized through the shuffle per partition;
B = ``exact_quantiles_histogram`` — the same content flowing once as
    (column, value, count) rows through a map-side-combined HashAggregate
    + per-(column, value-bucket) cumulative windows.

Both compute EXACT linear-interpolated quantiles; results are asserted
equal to 6 decimals before timing is reported. Interleaved A/B/A/B over
``reps`` rounds (same process, same session) so neighbor load hits both
sides equally — the only honest seconds comparison on this box
(SCALE.md r7).

Usage: python tools/quantile_ab.py [sf_dir] [reps]
       (default /root/testdata/sf0.1, 3 reps)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mbgspark.io import load_table
from mbgspark.operators.profiling import exact_quantiles_histogram
from mbgspark.session import ensure_session_conf, get_spark

COLS = ["l_discount", "l_extendedprice", "l_quantity"]
QS = [0.5, 0.95]


def builtin_percentile(df):
    """One ``percentile(col, array(qs))`` aggregate PER COLUMN — the A
    side. ADVICE r13: the original draft built one scalar function per
    (column, quantile) — 6 buffers each serializing its own full
    distinct-value map — which roughly doubled A's dominant cost and
    inflated the recorded ratios. Array-form shares one buffer across
    all quantiles of a column, the strongest honest builtin baseline."""
    qs_sql = ", ".join(map(str, QS))
    aggs = [
        F.expr(f"percentile({c}, array({qs_sql}))").alias(f"{c}__qs")
        for c in COLS
    ]
    return df.agg(*aggs)


def hist_pipeline(df):
    return exact_quantiles_histogram(df, COLS, QS)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("quantile_ab")
    ensure_session_conf(spark)
    spark.sparkContext.setLogLevel("ERROR")
    df = load_table(spark, sf_dir, "lineitem")

    # correctness gate first: both sides agree to 6 dp
    a_row = builtin_percentile(df).collect()[0]
    b_rows = {r["column_name"]: r for r in hist_pipeline(df).collect()}
    for c in COLS:
        for i in range(len(QS)):
            av, bv = a_row[f"{c}__qs"][i], b_rows[c][f"q{i}"]
            assert abs(av - bv) < 1e-6, (c, i, av, bv)
    print(f"values agree on {len(COLS)}x{len(QS)} quantiles; timing...")

    times = {"builtin": [], "histogram": []}
    for r in range(reps):
        for name, fn in (("builtin", builtin_percentile),
                         ("histogram", hist_pipeline)):
            t0 = time.time()
            fn(df).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            times[name].append(dt)
            print(f"  rep {r + 1} {name:9s} {dt:6.2f}s")
    a, b = min(times["builtin"]), min(times["histogram"])
    print(
        f"best-of-{reps}: builtin {a:.2f}s, histogram {b:.2f}s "
        f"-> {a / b:.1f}x ({sf_dir})"
    )


if __name__ == "__main__":
    main()
