"""Deterministic k-means: separable clusters converge, runs are reproducible."""

from mbgspark.operators.similarity import assign_clusters, kmeans_assignments


def _df(spark):
    # two tight groups far apart in 2-D
    rows = [
        (0, [0.0, 0.0]),
        (1, [10.0, 10.0]),
        (2, [0.5, 0.0]),
        (3, [10.0, 10.5]),
        (4, [0.0, 0.5]),
        (5, [10.5, 10.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_kmeans_separates_obvious_clusters(spark):
    out = kmeans_assignments(_df(spark), k=2, iterations=3)
    got = {r["vec_id"]: r["cluster"] for r in out.collect()}
    assert got[0] == got[2] == got[4]
    assert got[1] == got[3] == got[5]
    assert got[0] != got[1]


def test_kmeans_deterministic_across_runs(spark):
    a = sorted((r["vec_id"], r["cluster"]) for r in kmeans_assignments(_df(spark), 2, 3).collect())
    b = sorted((r["vec_id"], r["cluster"]) for r in kmeans_assignments(_df(spark), 2, 3).collect())
    assert a == b


def test_assignment_tiebreak_lowest_cluster(spark):
    # equidistant point: array_position picks the FIRST min → cluster 0
    df = spark.createDataFrame([(0, [5.0, 5.0])], "vec_id long, embedding array<double>")
    out = assign_clusters(df, [[0.0, 0.0], [10.0, 10.0]])
    assert out.collect()[0]["cluster"] == 0
