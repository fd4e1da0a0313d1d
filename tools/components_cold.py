"""One-off experiment: where does dup_components' cold 3.7 s go, and does
disabling whole-stage codegen for the iterative star-contraction rounds
recover it?

The bench protocol cold-times dup_components (plan rebuilt per run); SCALE.md
r7 root-caused the cold/warm 11x gap to whole-stage-codegen JIT across ~5
rounds of star plan shapes. Hypothesis: those per-round plans run over tiny
checkpointed edge frames (hundreds of rows at sf0.1), so interpreted
evaluation is just as fast to RUN and skips the per-shape javac/JIT compile
entirely — cutting the cold time without touching warm/scale behavior.

Usage: python tools/components_cold.py [sf_dir] [mode ...]
  modes: default | nocodegen | edges_only  (default: all three)
Each mode runs in a FRESH SparkSession-equivalent state? No — same JVM, but
codegen caches key on generated source, so a prior default-mode run would
warm the nocodegen run's shapes. Order therefore matters: run each mode in
its own process for honest cold numbers:
  for m in edges_only default nocodegen; do python tools/components_cold.py /root/testdata/sf0.1 $m; done
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from mbgspark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.1"
    modes = [a for a in args if "/" not in a] or ["edges_only", "default", "nocodegen"]

    from pyspark.sql import functions as F

    from mbgspark.operators.components import connected_components
    from mbgspark.plans.catalog_ext import dup_components, dedup_ngram_jaccard

    spark = get_spark("components-cold")
    spark.sparkContext.setLogLevel("ERROR")
    # bench-equivalent warm-up at sf0.001
    dup_components(spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()

    for mode in modes:
        if mode == "nocodegen":
            spark.conf.set("spark.sql.codegen.wholeStage", "false")
        else:
            spark.conf.set("spark.sql.codegen.wholeStage", "true")
        for rep in range(3):
            t0 = time.time()
            if mode == "edges_only":
                dedup_ngram_jaccard(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            else:
                dup_components(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            print(f"{mode} rep{rep}: {time.time() - t0:.3f}s", flush=True)


if __name__ == "__main__":
    main()
