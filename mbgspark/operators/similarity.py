"""Similarity search over an embedding column (array<float>).

- ``brute_force_topk``: exact cosine top-k of every query vector against the
  corpus — the correctness baseline. Query side is broadcast (queries are
  few); the corpus side streams, so the join is a BroadcastNestedLoopJoin
  that scales with corpus size, not corpus².
- ``ivf_topk``: the scale path — a deterministic IVF-style coarse quantizer:
  corpus vectors are assigned to the nearest of C centroids (centroids =
  first C corpus vectors by id, a deterministic seed choice), queries probe
  only their ``nprobe`` nearest cells. Turns all-pairs into a cell-bucketed
  equi-join, the same shape a 1000-executor ANN job wants.

Scores are rounded to 4 dp with id tiebreaks so results hash stably across
engines (SURVEY.md §2.11 determinism rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mbgspark.operators.dedup import cosine_sim


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query vector (excluding self-matches)."""
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    )
    c = corpus.select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(q)
        .filter(F.col("match_id") != F.col("query_id"))
        .withColumn("cos_sim", F.round(cosine_sim(F.col("qv"), F.col("cv")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("match_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "match_id", "cos_sim", F.col("rnk").cast("bigint").alias("rnk"))
        .orderBy("query_id", "rnk")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via IVF cells.

    Centroids are the ``n_cells`` lowest-id corpus vectors — deterministic and
    cheap; on a real cluster swap in k-means centroids (pyspark.ml) without
    changing the join shape. Assignment and probing are broadcast joins
    against the tiny centroid table; the candidate join is an equi-join on
    cell id."""
    cents = F.broadcast(
        corpus.orderBy(id_col).limit(n_cells).select(
            F.col(id_col).alias("cell_id"), F.col(vec_col).alias("cent")
        )
    )
    # corpus → nearest cell (top-1 by cosine)
    w_assign = Window.partitionBy("match_id").orderBy(F.desc("a_sim"), F.asc("cell_id"))
    assigned = (
        corpus.select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("cv"))
        .crossJoin(cents)
        .withColumn("a_sim", F.round(cosine_sim(F.col("cv"), F.col("cent")), 6))
        .withColumn("__rn", F.row_number().over(w_assign))
        .filter(F.col("__rn") == 1)
        .select("match_id", "cv", "cell_id")
    )
    # query → nprobe nearest cells
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("p_sim"), F.asc("cell_id"))
    probes = (
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
        .crossJoin(cents)
        .withColumn("p_sim", F.round(cosine_sim(F.col("qv"), F.col("cent")), 6))
        .withColumn("__rn", F.row_number().over(w_probe))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "qv", "cell_id")
    )
    scored = (
        assigned.join(probes, "cell_id")
        .filter(F.col("match_id") != F.col("query_id"))
        .withColumn("cos_sim", F.round(cosine_sim(F.col("qv"), F.col("cv")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("match_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "match_id", "cos_sim", F.col("rnk").cast("bigint").alias("rnk"))
        .orderBy("query_id", "rnk")
    )
