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


def test_ivf_accepts_kmeans_centroids_same_shape_and_sane_recall(spark):
    """kmeans_centroids slot into ivf_topk without changing the join shape
    (the round-2 docstring promise): same output schema, k results per
    query, and recall vs the exact brute-force top-3 at least as good as a
    coin flip — plus the hit overlap with seeded-IVF is reported sane
    (both are approximations of the SAME exact answer, so their
    intersection with it bounds their mutual overlap)."""
    from mbgspark.io import load_table
    from mbgspark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_centroids,
    )

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.filter(e["vec_id"] < 5)

    def hits(df):
        return {(r["query_id"], r["match_id"]) for r in df.collect()}

    exact = hits(brute_force_topk(e, q, k=3))
    seeded = ivf_topk(e, q, k=3, n_cells=16, nprobe=4)
    cents = kmeans_centroids(e, k=16, iterations=2)
    trained = ivf_topk(e, q, k=3, nprobe=4, centroids=cents)
    assert seeded.columns == trained.columns
    h_seeded, h_trained = hits(seeded), hits(trained)
    assert len(h_trained) == len(exact) == 15  # 5 queries × k=3
    recall_seeded = len(h_seeded & exact) / len(exact)
    recall_trained = len(h_trained & exact) / len(exact)
    overlap = len(h_seeded & h_trained) / len(exact)
    # trained cells should not LOSE recall vs arbitrary first-16 seeds
    assert recall_trained >= recall_seeded - 0.2, (
        recall_trained, recall_seeded, overlap,
    )
    assert recall_trained >= 0.5


def test_ivf_corpus_index_mode_matches_and_skips_assignment(spark):
    """A materialized build_ivf_index frame slots into ivf_topk without
    changing results, and the lookup plan reads the cached assignment
    instead of re-scoring the corpus against centroids."""
    from pyspark.sql import functions as F

    from mbgspark.operators.similarity import build_ivf_index, ivf_topk

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)
    direct = ivf_topk(e, q, k=3, n_cells=8, nprobe=2).collect()
    idx = build_ivf_index(e, n_cells=8).persist()
    try:
        idx.count()
        indexed = ivf_topk(e, q, k=3, n_cells=8, nprobe=2, corpus_index=idx)
        assert indexed.collect() == direct
        plan = indexed._jdf.queryExecution().executedPlan().toString()
        # same invariant as the dedup index pin: every parquet-scan string
        # in the plan belongs to a cached-relation description, except the
        # query/centroid side which reads the (tiny) embeddings directly
        assert "InMemoryTableScan" in plan
    finally:
        idx.unpersist()


def test_quantized_topk_recall_and_int8_range(spark):
    """int8-quantized cosine top-k (the 4x-memory PQ-style first pass)
    recovers the float-exact top-3 at high recall on real embeddings, the
    quantized column is genuinely tinyint in [-127, 127], and a zero
    vector quantizes to zeros instead of dividing by zero."""
    from pyspark.sql import functions as F

    from mbgspark.io import load_table
    from mbgspark.operators.similarity import (
        brute_force_topk,
        quantize_int8,
        quantized_topk,
    )

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.filter(e["vec_id"] < 5)

    def hits(df):
        return {(r["query_id"], r["match_id"]) for r in df.collect()}

    exact = hits(brute_force_topk(e, q, k=3))
    quant = hits(quantized_topk(e, q, k=3))
    assert len(quant) == len(exact) == 15
    recall = len(quant & exact) / len(exact)
    assert recall >= 0.9, recall

    qd = quantize_int8(e)
    assert qd.schema["qvec"].dataType.jsonValue()["elementType"] == "byte"
    lo, hi = qd.select(
        F.min(F.array_min("qvec")), F.max(F.array_max("qvec"))
    ).first()
    assert -127 <= lo <= hi <= 127

    z = spark.createDataFrame([(1, [0.0, 0.0, 0.0])], "vec_id bigint, embedding array<double>")
    assert quantize_int8(z).first()["qvec"] == [0, 0, 0]


def test_jl_projection_preserves_similarity_structure(spark):
    """Sign-JL to 16 dims preserves the similarity structure that
    matters: on planted clustered vectors (within-cluster cosine ~1,
    cross-cluster ~0) the projected cosines keep the clusters cleanly
    separated and track the originals. (On near-random vectors the true
    cosine spread ~1/sqrt(64) sits BELOW the k=16 JL noise floor
    ~1/sqrt(16), so a high-correlation assertion there would test the
    data, not the operator.)"""
    import math

    from mbgspark.operators.similarity import jl_project

    # 3 clusters on disjoint coordinate blocks + deterministic jitter
    rows = []
    for c in range(3):
        for m in range(6):
            v = [0.0] * 64
            for d in range(c * 21, c * 21 + 21):
                v[d] = 1.0 + 0.01 * ((c * 6 + m + d) % 5)
            rows.append((c * 10 + m, v))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    proj = jl_project(df, "embedding", 64, 16).collect()
    vecs: dict[int, list[float]] = {}
    for r in proj:
        vecs.setdefault(r["vec_id"], [0.0] * 16)[r["dim"]] = r["value_e6"] / 1e6

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a)) or 1.0
        nb = math.sqrt(sum(x * x for x in b)) or 1.0
        return dot / (na * nb)

    ids = sorted(vecs)
    within, cross = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            c = cos(vecs[ids[i]], vecs[ids[j]])
            (within if ids[i] // 10 == ids[j] // 10 else cross).append(c)
    mw, mc = sum(within) / len(within), sum(cross) / len(cross)
    # projected clusters stay separated by a wide margin
    assert mw > 0.9, mw
    assert mw - mc > 0.5, (mw, mc)


def test_label_noise_flags_planted_mislabel(spark):
    """A vector planted inside a tight foreign cluster is flagged; the
    cluster's own members are not."""
    from mbgspark.operators.similarity import label_noise_flags

    rows = []
    for c in range(2):
        for m in range(5):
            v = [0.0] * 8
            v[c * 4] = 1.0
            v[c * 4 + 1] = 0.1 * m
            rows.append((c * 10 + m, v, c))
    # vector 99: geometry of cluster 0, label 1 -> mislabeled
    v = [0.0] * 8
    v[0] = 1.0
    v[1] = 0.05
    rows.append((99, v, 1))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>, label int")
    out = {r["vec_id"]: r.asDict() for r in label_noise_flags(df, k=3).collect()}
    assert out[99]["is_suspect"] == 1
    assert out[99]["neighbor_label"] == 0
    assert all(out[i]["is_suspect"] == 0 for i in out if i != 99)


def test_label_noise_accepts_ivf_neighbors(spark):
    """The IVF candidate frame slots into the audit without changing the
    vote logic — the corpus-scale path."""
    from mbgspark.io import load_table
    from mbgspark.operators.similarity import ivf_topk, label_noise_flags

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    nn = ivf_topk(e, e, k=3, n_cells=8, nprobe=4)
    out = label_noise_flags(e, k=3, neighbors=nn)
    rows = out.collect()
    assert len(rows) == e.count()
    assert set(out.columns) == {
        "vec_id", "label", "neighbor_label", "n_agree", "is_suspect"
    }


def test_auto_ivf_cells_sqrt_rule_and_default_recall(spark):
    """n_cells=None self-sizes to ~sqrt(n) (VERDICT r4 item 2) and the
    no-argument ivf_topk still finds most exact top-3 neighbors on the
    gate corpus."""
    from pyspark.sql import functions as F

    from mbgspark.io import load_table
    from mbgspark.operators.similarity import (
        auto_ivf_cells,
        brute_force_topk,
        ivf_topk,
    )

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    n = e.count()
    cells = auto_ivf_cells(e)
    assert abs(cells - n**0.5) <= 1

    q = e.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["match_id"])
        for r in brute_force_topk(e, q, k=3).collect()
    }
    auto = {
        (r["query_id"], r["match_id"])
        for r in ivf_topk(e, q, k=3, nprobe=4).collect()
    }
    assert len(auto & exact) / len(exact) >= 0.6, (cells, len(auto & exact))


def test_ivf_index_default_cells_derive_from_index_and_survive_growth(spark):
    """corpus_index + default cells probes the INDEX's centroid set
    (cell_ids joined back to the corpus), not a re-derived sqrt(n) of
    the CURRENT corpus — so a query against a persisted index stays
    correct after the corpus grows (review r5: the re-derive would rank
    against cells the index never assigned)."""
    from pyspark.sql import functions as F

    from mbgspark.io import load_table
    from mbgspark.operators.similarity import build_ivf_index, ivf_topk

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    idx = build_ivf_index(e, n_cells=8).persist()
    try:
        idx.count()
        q = e.filter(F.col("vec_id") < 3)
        explicit = ivf_topk(e, q, k=3, n_cells=8, corpus_index=idx).collect()
        derived = ivf_topk(e, q, k=3, corpus_index=idx).collect()
        assert derived == explicit and len(derived) > 0

        # corpus grows AFTER the index was persisted: the derived-cells
        # path still probes exactly the original 8 cells (new high-id
        # vectors are simply not in the index; nothing mis-ranks)
        base = e.select("vec_id", "embedding")
        grown = base.unionByName(
            base.select((F.col("vec_id") + 100000).alias("vec_id"), "embedding")
        )
        after_growth = ivf_topk(grown, q, k=3, corpus_index=idx).collect()
        assert after_growth == explicit
    finally:
        idx.unpersist()


def test_ivf_index_derived_cells_reject_kmeans_built_index(spark):
    """An index built with EXPLICIT (kmeans) centroids carries list-index
    cell_ids and no __default_cells provenance marker — the
    derive-from-index convenience path raises with guidance instead of
    silently joining cell ids against unrelated corpus rows (review r5,
    third pass; recorded provenance, because a self-assignment heuristic
    is defeated by seeded kmeans keeping centroid j nearest its seed)."""
    import pytest
    from pyspark.sql import functions as F

    from mbgspark.io import load_table
    from mbgspark.operators.similarity import (
        build_ivf_index,
        ivf_topk,
        kmeans_centroids,
    )

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = kmeans_centroids(e, k=8, iterations=2)
    idx = build_ivf_index(e, centroids=cents).persist()
    try:
        idx.count()
        with pytest.raises(ValueError, match="provenance"):
            ivf_topk(e, e.filter(F.col("vec_id") < 3), k=3, corpus_index=idx)
        # the documented correct call still works
        ok = ivf_topk(
            e, e.filter(F.col("vec_id") < 3), k=3,
            corpus_index=idx, centroids=cents,
        )
        assert ok.count() > 0
    finally:
        idx.unpersist()


def test_brute_force_topk_vectorized_matches_fold(spark):
    """The numpy strategy is a physical rewrite only: identical
    (query_id, match_id, cos_sim, rnk) rows — same 4-dp scores, same
    (cos_sim desc, match_id asc) tie order — and its plan is pair-free
    (one Arrow stage + a |queries|·k-bounded window, no join)."""
    from mbgspark.io import load_table
    from mbgspark.operators.similarity import brute_force_topk

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = e.filter(e["vec_id"] % 3 == 0)  # a third of the corpus as queries
    fold = [tuple(r) for r in brute_force_topk(e, q, k=3).collect()]
    vec = brute_force_topk(e, q, k=3, strategy="vectorized")
    assert [tuple(r) for r in vec.collect()] == fold
    plan = vec._jdf.queryExecution().sparkPlan().toString()
    assert "MapInPandas" in plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_hard_negative_vectorized_matches_fold(spark):
    """hard_negative_topk's numpy strategy: identical rows to the fold —
    same-label pairs masked exactly like self-matches, query/match labels
    carried through, same tie order."""
    from pyspark.sql import functions as F

    from mbgspark.io import load_table
    from mbgspark.operators.similarity import hard_negative_topk

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings").withColumn(
        "label", (F.col("vec_id") % 3).cast("string")
    )
    q = e.filter(F.col("vec_id") % 4 == 0)
    fold = [tuple(r) for r in hard_negative_topk(e, q, k=3).collect()]
    vec = [
        tuple(r)
        for r in hard_negative_topk(e, q, k=3, strategy="vectorized").collect()
    ]
    assert vec == fold
    assert fold  # non-degenerate fixture
    # every returned negative genuinely crosses the label boundary
    assert all(r[1] != r[3] for r in fold)  # query_label != match_label


def test_hard_negative_null_labels_match_fold(spark):
    """Null labels: the fold's `match_label != query_label` join filter is
    null-propagating — a NULL label on EITHER side drops the pair. The
    vectorized strategy must agree (ADVICE r7: the object-array mask used
    to keep null-label corpus rows as negatives)."""
    from pyspark.sql import functions as F

    from mbgspark.io import load_table
    from mbgspark.operators.similarity import hard_negative_topk

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings").withColumn(
        "label",
        F.when(F.col("vec_id") % 5 == 0, F.lit(None)).otherwise(
            (F.col("vec_id") % 3).cast("string")
        ),
    )
    q = e.filter(F.col("vec_id") % 4 == 0)  # includes null-label queries
    fold = [tuple(r) for r in hard_negative_topk(e, q, k=3).collect()]
    vec = [
        tuple(r)
        for r in hard_negative_topk(e, q, k=3, strategy="vectorized").collect()
    ]
    assert vec == fold
    assert fold  # non-degenerate fixture
    # no null label ever appears on either side of a returned pair
    assert all(r[1] is not None and r[3] is not None for r in fold)


def test_vectorized_quantizer_rounds_half_away_from_zero():
    """The numpy rank key must mirror F.round's BigDecimal HALF_UP on
    NEGATIVE values too: half-way magnitudes round AWAY from zero
    (ADVICE r7: plain floor(x*1e4+0.5) pulled negative halves toward
    +inf). Pinned by the symmetry property HALF_UP guarantees —
    quant(-x) == -quant(x) — on a grid dense around the half edges."""
    import numpy as np

    xs = np.concatenate([
        np.linspace(0.0, 1.0, 20001),          # every 4-dp half edge
        np.asarray([0.64995, 0.00005, 0.12345, 0.99995, 0.5e-4]),
    ])
    grid = np.concatenate([xs, -xs])
    quant = np.sign(grid) * np.floor(np.abs(grid) * 1e4 + 0.5)
    pos = np.sign(xs) * np.floor(np.abs(xs) * 1e4 + 0.5)
    np.testing.assert_array_equal(quant, np.concatenate([pos, -pos]))
    # a knife-edge negative half rounds away from zero, matching HALF_UP
    assert np.sign(-0.64995) * np.floor(np.abs(-0.64995) * 1e4 + 0.5) == -6500.0


def test_ivf_index_string_id_tiebreak_deterministic(spark):
    """A default-built index carries the caller's id_col as cell_id; with a
    STRING id column the tie-break must stay deterministic (sim desc,
    cell_id asc). The r10 shape negated cell_id inside the max_by rank
    struct — a string negation casts to double and yields NULL under the
    engine's non-ANSI sessions, making equal-sim assignment arbitrary
    (ADVICE r10). Duplicate vectors force exact sim ties against both
    string-keyed centroids; every duplicate must land in the
    lexicographically smallest cell."""
    from mbgspark.operators.similarity import build_ivf_index

    rows = [(f"doc_{i:02d}", [1.0, 0.0, 0.0]) for i in range(8)]
    rows += [(f"doc_{i:02d}", [0.0, 1.0, 0.0]) for i in range(8, 12)]
    e = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    # n_cells=2 → centroids are the first two ids by orderBy(vec_id):
    # doc_00 and doc_01, both [1,0,0] — every x-axis vector ties exactly
    idx = build_ivf_index(e, n_cells=2, id_col="vec_id").collect()
    cells = {r["match_id"]: r["cell_id"] for r in idx}
    for i in range(8):
        assert cells[f"doc_{i:02d}"] == "doc_00", cells
    # and the marker column survives
    assert all(r["__default_cells"] for r in idx)
