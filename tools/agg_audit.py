"""Catalog-wide aggregate-strategy audit — the SortAggregate detector.

The r12 two-decade ledger sweep traced two real scale walls to one
planning rule: an aggregate whose buffer type is immutable (strings,
structs) cannot use whole-stage-codegen HashAggregate; it plans as
ObjectHashAggregate — whose sort-based fallback (128-key default
threshold) degenerates to a full partition sort — or directly as
SortAggregate. On unbounded input that is a sort of EVERY row per
aggregation pass (the 939 MB/pass minhash spill; the explode-path
first-match argmin). Both were fixed by a numeric twin: min over a
60-bit window / min(order) + broadcast join-back.

This tool walks every catalog plan and reports each SortAggregate /
ObjectHashAggregate with its aggregate functions, classified against
an allowlist of INHERENT uses (audited by hand in r12 — see
NOTES_r12.md "aggregate sweep"):

- list/set packing: collect_list / collect_set (the data IS the list);
- exact percentiles (ObjectHash is Spark's exact-percentile home);
- HLL sketches (typed-imperative by design);
- first(...) inside the count-distinct EXPAND rewrite (post-aggregate
  rows, bounded by group count);
- argmax/argmin over struct keys on inputs bounded by construction
  (keep_best pair sets, SCD2 dims, ANN probe assignments, the ≤602-row
  broadcast dim dedupe, label_noise's per-split winner);
- exact min/max of full-width hex keys / dates-in-structs where no
  numeric isomorphism exists (corpus_shuffle_shards' 128-bit shard
  boundaries, scd2 validity structs, the profiler's arbitrary-string
  column min/max inside grouping sets).

A NEW sort-class aggregate outside the allowlist exits 1: either give
it a numeric twin (the minhash/argmin playbook) or, if it is genuinely
inherent AND its input is bounded, extend the allowlist with a comment
saying why.

Usage: python tools/agg_audit.py [SF_DIR] [NAME...]
       (defaults: /root/testdata/sf0.001, all catalog queries)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mbgspark.jvmseam import node_class, physical_plan_root, walk_plan
from mbgspark.plans.catalog import CATALOG
from mbgspark.session import ensure_session_conf, get_spark

# function-level patterns that are inherent wherever they appear
_INHERENT_FN = re.compile(
    r"collect_list|collect_set|percentile|hll_sketch_agg|merge_hll_sketch_agg"
)

# (query, function-substring) pairs audited as bounded-input/inherent (r12)
_ALLOW: set[tuple[str, str]] = {
    ("ann_ivf_topk", "min_by"),            # probe-cell assignments, fanout-bounded
    ("ann_ivf_kmeans_topk", "min_by"),     # same, k-means cells
    ("cardinality_sketch_users", "count(distinct"),  # rides the hll agg node
    ("corpus_shuffle_shards", "min(shuffle_key"),    # exact 128-bit shard bounds
    ("corpus_shuffle_shards", "max(shuffle_key"),
    ("dedup_embedding_keep_best", "max_by"),  # near-dup cluster rows, pair-bounded
    ("dedup_semantic_keep_best", "max_by"),
    ("label_noise", "max_by"),             # per-(split,label) winners, group-bounded
    ("profile_orders", "first("),          # count-distinct EXPAND, post-agg rows
    ("profile_orders", "min(o_"),          # arbitrary-column profiler: string
    ("profile_orders", "max(o_"),          #   min/max has no numeric twin
    ("profile_orders", "sum(length"),      # rides the same grouping-sets agg node
    ("profile_orders", "count("),
    ("scd2_customer_dim", "max(struct"),   # SCD2 dim build, dim-bounded
    ("scd2_asof_revenue", "max("),         # as-of validity struct, dim-bounded
    ("user_features", "max_by"),           # last-event argmax; local sort beats a
    ("user_features", "sum("),             #   self-join back into events (audited)
    ("user_features", "count("),
    ("user_features", "max("),
    # r13: the q10/locate_full_dim "min(struct(kw" dim-dedupe entries were
    # pruned — the argmin join-back now guards order_col uniqueness up
    # front (ADVICE r12) and the dedupe aggregate no longer exists.
}


def classify(name: str, df) -> tuple[list[str], list[str]]:
    """(unexplained, explained) sort-class aggregate lines for ONE plan."""
    unexplained: list[str] = []
    explained: list[str] = []
    for node in walk_plan(physical_plan_root(df)):
        c = node_class(node)
        if c not in ("SortAggregateExec", "ObjectHashAggregateExec"):
            continue
        s = node.simpleString(300)
        m = re.search(r"functions=\[([^\]]*)", s)
        fns = m.group(1) if m else "?"
        core = re.sub(r"partial_", "", fns)
        line = f"{name}: {c[:-4]} [{core[:100]}]"
        if _INHERENT_FN.search(core):
            explained.append(line)
        elif any(q == name and pat in core for q, pat in _ALLOW):
            explained.append(line)
        else:
            unexplained.append(line)
    return unexplained, explained


def audit(spark, names) -> tuple[list[str], list[str]]:
    """Returns (unexplained, explained) finding lines over catalog rows."""
    unexplained: list[str] = []
    explained: list[str] = []
    for name in names:
        u, e = classify(name, CATALOG[name][0](spark, SF))
        unexplained += u
        explained += e
    return unexplained, explained


SF = "/root/testdata/sf0.001"


def main() -> int:
    global SF
    if len(sys.argv) > 1:
        SF = sys.argv[1]
    names = sys.argv[2:] or list(CATALOG)
    unknown = [n for n in names if n not in CATALOG]
    if unknown:
        sys.exit(f"agg_audit: not in CATALOG: {unknown}")
    spark = get_spark("agg_audit")
    ensure_session_conf(spark)
    spark.sparkContext.setLogLevel("ERROR")
    unexplained, explained = audit(spark, names)
    for line in sorted(set(unexplained)):
        print(f"UNEXPLAINED {line}")
    print(
        f"{len(names)} plans audited: {len(set(explained))} allowlisted "
        f"sort-class aggregates, {len(set(unexplained))} unexplained"
    )
    return 1 if unexplained else 0


if __name__ == "__main__":
    raise SystemExit(main())
