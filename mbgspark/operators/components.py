"""Connected components over near-duplicate pairs — the clustering step
between pair detection (MinHash/LSH, n-gram Jaccard) and canonical-document
selection in a dedup pipeline: pairs only say "these two match"; keeping
exactly one doc per duplicate CLUSTER needs the transitive closure.

Algorithm: min-label propagation (each node repeatedly adopts the smallest
component id among itself and its neighbors) — every iteration is one
equi-join + one hash aggregate, so the work distributes like any other
shuffle stage and the driver holds only the iteration counter. Convergence
is detected from a monotone invariant: labels only ever decrease, so the
global sum(label) strictly decreases until the fixpoint — one cheap agg
action per iteration instead of a changed-rows join. Lineage is truncated
per iteration (localCheckpoint), the standard Spark idiom for iterative
graph algorithms, so the plan doesn't double each round.

Iterations needed = graph diameter. Duplicate clusters are shallow (near-dup
graphs are mostly small cliques/chains), so the default cap is generous; for
adversarially long chains at 100 TB, the production refinement is the
large-star/small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond"), which converges in O(log n) rounds with the same
join-aggregate building blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iterations: int = 15,
) -> DataFrame:
    """Component id (= min node id in the component) for every node that
    appears in ``edges`` (undirected). Deterministic: min-based labels, no
    RNG, no partitioning sensitivity."""
    und = edges.select(
        F.col(a_col).cast("bigint").alias("src"),
        F.col(b_col).cast("bigint").alias("dst"),
    ).union(
        edges.select(
            F.col(b_col).cast("bigint").alias("src"),
            F.col(a_col).cast("bigint").alias("dst"),
        )
    )
    labels = (
        und.select(F.col("src").alias("id")).distinct().withColumn("comp", F.col("id"))
    )
    prev_sum = None
    for _ in range(max_iterations):
        nbr = (
            und.join(labels, und["dst"] == labels["id"])
            .select(und["src"].alias("id"), F.col("comp").alias("__nc"))
            .groupBy("id")
            .agg(F.min("__nc").alias("__nbr_min"))
        )
        labels = labels.join(nbr, "id", "left").select(
            "id",
            F.least(F.col("comp"), F.coalesce("__nbr_min", "comp")).alias("comp"),
        )
        # truncate lineage (iterative-join plans otherwise double per round)
        labels = labels.localCheckpoint()
        s = labels.agg(F.sum("comp")).collect()[0][0]
        if s == prev_sum:
            break
        prev_sum = s
    return labels.select("id", F.col("comp").alias("component"))


def canonical_by_component(
    df: DataFrame,
    components: DataFrame,
    id_col: str,
) -> DataFrame:
    """Semantic-dedup keep-one-per-cluster: drop every row whose id appears
    in ``components`` with component != id (the min-id member is canonical).
    Rows not in any component are singletons and always kept. An anti-join
    on the (small) non-canonical id set — broadcastable, no window over the
    corpus."""
    non_canonical = components.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(F.broadcast(non_canonical), id_col, "left_anti")
