"""Streaming parity — X5-X8 driven through real readStream/writeStream with
availableNow triggers (micro-batch files on disk, not mocks)."""

import json

from pyspark.sql import functions as F

from mbgspark.streaming import (
    daily_counts_stream,
    dedup_stream,
    read_tweet_stream,
    session_counts_stream,
    start_merge_sink,
)


def _write_batch(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    f = path / f"batch_{len(list(path.iterdir()))}.json"
    f.write_text("\n".join(json.dumps(r) for r in rows))


R1 = {
    "_id": "1", "text": "hello world one", "created_at": "2025-01-01T10:00:00Z",
    "scraped_at": "2025-01-01T11:00:00Z", "tweet_url": "u", "author_handle": "h",
    "author_name": "n", "location": None, "reply_count": 1, "retweet_count": 1,
    "like_count": 1,
}
R1B = {**R1, "like_count": 5, "scraped_at": "2025-01-01T12:00:00Z"}  # re-delivery
R2 = {**R1, "_id": "2", "text": "second tweet here", "created_at": "2025-01-02T09:00:00Z"}


def test_stream_dedup_and_window(spark, tmp_path):
    src = tmp_path / "src"
    _write_batch(src, [R1, R1B, R2])
    stream = read_tweet_stream(spark, str(src))
    deduped = dedup_stream(stream)
    counts = daily_counts_stream(deduped)
    q = (
        counts.writeStream.format("memory")
        .queryName("daily_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        str(r["day_start"]): r["cnt"]
        for r in spark.sql("select * from daily_counts").collect()
    }
    # tumbling day windows align to midnight; the _id=1 re-delivery was deduped
    assert got == {"2025-01-01 00:00:00": 1, "2025-01-02 00:00:00": 1}


def test_foreachbatch_merge_sink_idempotent(spark, tmp_path):
    src = tmp_path / "src2"
    store = str(tmp_path / "store")
    ckpt1, ckpt2 = str(tmp_path / "ck1"), str(tmp_path / "ck2")
    _write_batch(src, [R1, R2])
    q = start_merge_sink(
        read_tweet_stream(spark, str(src)), store, ckpt1, available_now=True
    )
    q.awaitTermination(120)
    assert spark.read.parquet(store).count() == 2

    # second delivery of _id=1 with newer scraped_at → update, not duplicate
    _write_batch(src, [R1B])
    q = start_merge_sink(
        read_tweet_stream(spark, str(src)), store, ckpt2, available_now=True
    )
    q.awaitTermination(120)
    back = spark.read.parquet(store)
    assert back.count() == 2
    assert back.filter(F.col("_id") == "1").first()["like_count"] == 5


def test_stateful_counts_survive_restart(spark, tmp_path):
    from mbgspark.streaming import stateful_author_counts

    src = tmp_path / "src3"
    ckpt = str(tmp_path / "ck3")

    def run_once(name):
        # memory sink can't recover from a checkpoint; foreachBatch can
        got = {}

        def collect(batch_df, batch_id):
            for r in batch_df.collect():
                got[r["author_handle"]] = (r["total_cnt"], r["total_likes"])

        q = (
            stateful_author_counts(read_tweet_stream(spark, str(src)))
            .writeStream.foreachBatch(collect)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return got

    _write_batch(src, [R1, R2])  # handle h: 2 rows, 2 likes
    got1 = run_once("state_run1")
    assert got1 == {"h": (2, 2)}

    # restart from the same checkpoint: state must carry over
    _write_batch(src, [R1B])  # 1 more row, 5 likes
    got2 = run_once("state_run2")
    assert got2 == {"h": (3, 7)}


def test_max_files_per_trigger_paces_batches(spark, tmp_path):
    # O3 pacing analog (max_per_page=50): 3 source files with
    # maxFilesPerTrigger=1 must process as 3 distinct micro-batches
    src = tmp_path / "src4"
    for r in (R1, R1B, R2):
        _write_batch(src, [r])
    batches = []

    def collect(batch_df, batch_id):
        batches.append(batch_df.count())

    q = (
        read_tweet_stream(spark, str(src), max_files_per_trigger=1)
        .writeStream.foreachBatch(collect)
        .option("checkpointLocation", str(tmp_path / "ck4"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert batches == [1, 1, 1]


def test_stream_static_broadcast_enrichment(spark, tmp_path):
    # stream-static join: micro-batches enrich against a broadcast dim
    # without stopping the stream (the streaming analog of J1's bounded-dim
    # contract)
    from pyspark.sql import functions as F

    src = tmp_path / "src5"
    _write_batch(src, [R1, R2])
    dim = spark.createDataFrame(
        [("h", "verified")], "author_handle string, badge string"
    )
    stream = read_tweet_stream(spark, str(src)).join(
        F.broadcast(dim), "author_handle", "left"
    )
    rows = []

    def collect(batch_df, batch_id):
        rows.extend(batch_df.select("_id", "badge").collect())

    q = (
        stream.writeStream.foreachBatch(collect)
        .option("checkpointLocation", str(tmp_path / "ck5"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert {(r["_id"], r["badge"]) for r in rows} == {("1", "verified"), ("2", "verified")}


def test_stream_session_windows_merge_across_batches(spark, tmp_path):
    # one event in batch 1, two in batch 2; the 10:20 event is within the
    # 30-min gap of 10:00, so session_window must MERGE state across
    # micro-batches (maxFilesPerTrigger=1 forces separate batches); 12:00
    # starts a fresh session. end = last event + gap.
    src = tmp_path / "sess_src"
    _write_batch(src, [R1])
    _write_batch(
        src,
        [
            {**R1, "_id": "s2", "created_at": "2025-01-01T10:20:00Z"},
            {**R1, "_id": "s3", "created_at": "2025-01-01T12:00:00Z"},
        ],
    )
    stream = read_tweet_stream(spark, str(src), max_files_per_trigger=1)
    q = (
        session_counts_stream(stream)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r["session_start"]), str(r["session_end"])): r["cnt"]
        for r in spark.sql("select * from sessions").collect()
    }
    assert got == {
        ("2025-01-01 10:00:00", "2025-01-01 10:50:00"): 2,
        ("2025-01-01 12:00:00", "2025-01-01 12:30:00"): 1,
    }


def test_stream_stream_interval_join(spark, tmp_path):
    # stream-stream inner join with an event-time interval condition: a
    # "view" stream joins the "click" stream for the same _id within
    # [view, view + 1h]. Both sides carry watermarks so Spark can bound the
    # buffered state; availableNow drains both sources.
    views_src = tmp_path / "ss_views"
    clicks_src = tmp_path / "ss_clicks"
    _write_batch(views_src, [R1, R2])  # views at 10:00 (id 1), 09:00 day2 (id 2)
    _write_batch(
        clicks_src,
        [
            {**R1, "created_at": "2025-01-01T10:30:00Z"},  # within 1h of view 1
            {**R2, "created_at": "2025-01-02T11:00:00Z"},  # 2h after view 2: out
        ],
    )
    views = (
        read_tweet_stream(spark, str(views_src))
        .select("_id", F.col("created_at").alias("view_ts"))
        .withWatermark("view_ts", "1 hour")
    )
    clicks = (
        read_tweet_stream(spark, str(clicks_src))
        .select(F.col("_id").alias("c_id"), F.col("created_at").alias("click_ts"))
        .withWatermark("click_ts", "1 hour")
    )
    joined = views.join(
        clicks,
        (F.col("_id") == F.col("c_id"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
    )
    rows = []

    def collect(batch_df, batch_id):
        rows.extend(batch_df.select("_id").collect())

    q = (
        joined.writeStream.foreachBatch(collect)
        .option("checkpointLocation", str(tmp_path / "ss_ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert [r["_id"] for r in rows] == ["1"]


def test_stream_curation_gate_composes_with_dedup_and_merge(spark, tmp_path):
    """The curation column operators (quality score, lang-ID, token
    counts) are pure projections, so they must run UNCHANGED on a
    streaming DataFrame — a nightly-batch curation gate and a streaming
    ingest gate are the same code. Pipeline: readStream → quality/token
    gate → cross-batch dedup → idempotent merge sink; low-quality rows
    never reach the store, re-deliveries update instead of duplicate."""
    from mbgspark.operators.textstats import (
        with_quality_score,
        with_token_counts,
    )

    src = tmp_path / "cur_src"
    store = str(tmp_path / "cur_store")
    good = {
        **R1,
        "text": "the quick brown fox jumps over a lazy dog of the meadow today",
    }
    short = {**R1, "_id": "9", "text": "tiny"}  # fails the n_tokens gate
    _write_batch(src, [good, {**good, "like_count": 7}, short])

    stream = read_tweet_stream(spark, str(src))
    gated = with_token_counts(
        with_quality_score(stream, "text"), "text"
    ).filter((F.col("n_tokens") >= 5) & (F.col("quality_score") >= 0.2))
    q = start_merge_sink(
        dedup_stream(gated.drop("n_chars")),
        store,
        str(tmp_path / "cur_ck"),
        available_now=True,
    )
    q.awaitTermination(120)
    back = spark.read.parquet(store)
    rows = back.collect()
    assert [r["_id"] for r in rows] == ["1"]  # short doc gated out, dup deduped
    assert rows[0]["ws_tokens"] == 13 and rows[0]["quality_score"] >= 0.2


def test_neardup_gate_admits_each_document_once(spark, tmp_path):
    from mbgspark.streaming import start_neardup_gate_sink

    src = tmp_path / "gate_src"
    store = str(tmp_path / "gate_store")
    ck = tmp_path / "gate_ck"

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    near = "quick brown fox jumps over the lazy dog near the river bank"  # 1st tok dropped
    other = "completely unrelated text about catalyst physical plan pruning rules"

    metrics: list = []

    def run(batch_rows, ckpt):
        _write_batch(src, batch_rows)
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .json(str(src))
        )
        q = start_neardup_gate_sink(
            stream, store, str(ckpt), threshold=0.5, available_now=True,
            on_metrics=lambda bid, m: metrics.append((bid, m)),
        )
        q.awaitTermination(120)
        return sorted(r["doc_id"] for r in spark.read.parquet(store).collect())

    # batch 1: doc 1 + its batch-internal near-dup 2 (lower id wins) + 3
    got = run(
        [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": near},
            {"doc_id": 3, "text": other},
        ],
        ck / "1",
    )
    assert got == [1, 3]

    # batch 2: near-dup of stored doc 1 is rejected, novel doc admitted
    got = run(
        [
            {"doc_id": 10, "text": near},
            {"doc_id": 11, "text": "fresh novel content with entirely new vocabulary tokens"},
        ],
        ck / "2",
    )
    assert got == [1, 3, 11]

    # replay the same source with a fresh checkpoint: the store is a
    # fixpoint of the gate (exact self-dups all rejected)
    got = run([], ck / "3")
    assert got == [1, 3, 11]

    # the per-batch LSH-cap metrics channel fired for every micro-batch
    # and reports zero drops on this un-viral corpus
    assert len(metrics) >= 2
    assert all(m["oversized_buckets"] == 0 for _, m in metrics)


def test_cardinality_sink_folds_sketches_and_replay_is_noop(spark, tmp_path):
    """Per-day HLL sketch rows accumulate across micro-batches; replaying
    the same keys leaves every estimate unchanged (HLL union idempotence
    — the sink's exactly-once story); total distinct = one union over the
    day rows, never a rescan of raw keys."""
    from mbgspark.streaming import read_tweet_stream, start_cardinality_sink

    src = tmp_path / "csrc"
    store = str(tmp_path / "cstore")

    def run(ckpt):
        q = start_cardinality_sink(
            read_tweet_stream(spark, str(src)),
            store,
            str(tmp_path / ckpt),
            key_col="author_handle",
            ts_col="created_at",
            available_now=True,
        )
        q.awaitTermination(120)

    day1 = [dict(R1, _id=str(i), author_handle=f"a{i % 3}") for i in range(10)]
    _write_batch(src, day1)
    run("ck_a")
    day2 = [
        dict(R2, _id=str(100 + i), author_handle=f"b{i % 5}") for i in range(10)
    ]
    _write_batch(src, day2)
    run("ck_b")

    est = {
        r["day"]: r["est"]
        for r in spark.read.parquet(store)
        .select("day", F.hll_sketch_estimate("hll_sketch").alias("est"))
        .collect()
    }
    assert est == {"2025-01-01": 3, "2025-01-02": 5}

    # replay batch 1 with a fresh checkpoint: union is idempotent
    run("ck_replay")
    est2 = {
        r["day"]: r["est"]
        for r in spark.read.parquet(store)
        .select("day", F.hll_sketch_estimate("hll_sketch").alias("est"))
        .collect()
    }
    assert est2 == est
    total = (
        spark.read.parquet(store)
        .agg(F.hll_sketch_estimate(F.expr("hll_union_agg(hll_sketch)")).alias("t"))
        .first()["t"]
    )
    assert total == 8


def test_drift_monitor_flags_shifted_batch(spark, tmp_path):
    """A batch matching the reference author mix logs a near-zero PSI; a
    skewed batch logs a PSI above the 0.25 action level."""
    from mbgspark.streaming import read_tweet_stream, start_drift_monitor_sink

    src = tmp_path / "dsrc"
    store = str(tmp_path / "dstore")
    reference = spark.createDataFrame(
        [(f"a{i % 4}",) for i in range(400)], "author_handle string"
    )

    def run(ckpt):
        q = start_drift_monitor_sink(
            read_tweet_stream(spark, str(src)),
            reference,
            store,
            str(tmp_path / ckpt),
            bucket_col="author_handle",
            available_now=True,
        )
        q.awaitTermination(120)

    balanced = [dict(R1, _id=str(i), author_handle=f"a{i % 4}") for i in range(40)]
    _write_batch(src, balanced)
    run("ck1")
    skewed = [dict(R1, _id=str(100 + i), author_handle="a0") for i in range(40)]
    _write_batch(src, skewed)
    run("ck2")

    rows = sorted(
        (r["batch_id"], r["psi_micro"]) for r in spark.read.parquet(store).collect()
    )
    # first run saw only the balanced batch; the second (fresh checkpoint)
    # re-read both files as one batch dominated by the skew
    assert len(rows) == 2
    balanced_psi = rows[0][1]
    mixed_psi = rows[1][1]
    assert balanced_psi < 50_000, balanced_psi
    assert mixed_psi > 250_000, mixed_psi


def test_cardinality_sink_recovers_staged_generation_after_crash(spark, tmp_path):
    """Crash-window recovery for the staged sketch-store swap (ADVICE
    r4): if a crash lands between delete-old and rename-staging, the
    live path is missing but the staging dir holds the fully-committed
    newest generation — the next fold renames it into place before
    folding, so no prior day's sketch is ever lost. Simulated by moving
    the store into the staging path (the exact on-disk crash state)."""
    import shutil

    from mbgspark.streaming import read_tweet_stream, start_cardinality_sink

    src = tmp_path / "crsrc"
    store = str(tmp_path / "crstore")

    def run(ckpt):
        q = start_cardinality_sink(
            read_tweet_stream(spark, str(src)),
            store,
            str(tmp_path / ckpt),
            key_col="author_handle",
            ts_col="created_at",
            available_now=True,
        )
        q.awaitTermination(120)

    day1 = [dict(R1, _id=str(i), author_handle=f"a{i % 3}") for i in range(10)]
    _write_batch(src, day1)
    run("cr_ck_a")

    # simulate the crash: store vanished mid-swap, staging holds the
    # committed generation
    shutil.move(store, store + "__staging")
    assert not (tmp_path / "crstore").exists()

    day2 = [
        dict(R2, _id=str(100 + i), author_handle=f"b{i % 5}") for i in range(10)
    ]
    _write_batch(src, day2)
    run("cr_ck_b")

    est = {
        r["day"]: r["est"]
        for r in spark.read.parquet(store)
        .select("day", F.hll_sketch_estimate("hll_sketch").alias("est"))
        .collect()
    }
    # day 1's sketches survived the crash; day 2 folded on top
    assert est == {"2025-01-01": 3, "2025-01-02": 5}


def test_merge_sink_restarts_from_checkpoint_after_mid_batch_crash(spark, tmp_path):
    """Kill-and-restart recovery for the merge sink (VERDICT r4 item 5;
    reference analog: the browser-restart recovery loop,
    resilient_etl.py:388-404). The crash state is constructed exactly as
    Spark leaves it when a query dies mid-batch: the checkpoint's
    offsets/N exists but commits/N does not — the batch's side effect
    (the store merge) already ran, the commit never landed. On restart
    the engine re-delivers batch N from the recorded offsets; the keyed
    merge is idempotent, so the store converges to the single-run
    result."""
    src = tmp_path / "crash_src"
    store = str(tmp_path / "crash_store")
    ck = tmp_path / "crash_ck"

    # batch 0 processed and committed...
    _write_batch(src, [R1, R2])
    q = start_merge_sink(
        read_tweet_stream(spark, str(src)), store, str(ck), available_now=True
    )
    q.awaitTermination(120)
    assert spark.read.parquet(store).count() == 2

    # ...then "crash mid-batch": erase the commit marker, keeping the
    # offset — the on-disk state of a query killed between side effect
    # and commit
    commit0 = ck / "commits" / "0"
    assert commit0.exists()
    commit0.unlink()
    crc = ck / "commits" / ".0.crc"  # local-FS checksum twin of the marker
    if crc.exists():
        crc.unlink()

    # more data arrives while the job is down
    _write_batch(src, [R1B])

    # restart from the SAME checkpoint: batch 0 replays (merge no-op),
    # then the new file processes as the next batch
    q = start_merge_sink(
        read_tweet_stream(spark, str(src)), store, str(ck), available_now=True
    )
    q.awaitTermination(120)

    back = spark.read.parquet(store)
    assert back.count() == 2
    assert back.filter(F.col("_id") == "1").first()["like_count"] == 5

    # equality with the no-crash single run over the same source
    fresh_store = str(tmp_path / "fresh_store")
    q = start_merge_sink(
        read_tweet_stream(spark, str(src)),
        fresh_store,
        str(tmp_path / "fresh_ck"),
        available_now=True,
    )
    q.awaitTermination(120)
    cols = sorted(back.columns)
    got = sorted(map(tuple, back.select(*cols).collect()))
    want = sorted(map(tuple, spark.read.parquet(fresh_store).select(*cols).collect()))
    assert got == want


def test_indexed_neardup_gate_admits_once_and_replays_idempotently(spark, tmp_path):
    """The index-maintaining gate (production form): later batches gate
    against the persisted MinHash index only (corpus text untouched),
    near-dups of stored docs are rejected, and a mid-batch crash
    (commit marker erased) replays to the identical store — partition-
    scoped idempotent overwrites, no append duplication."""
    from mbgspark.streaming import start_neardup_gate_sink_indexed

    src = tmp_path / "ig_src"
    store = str(tmp_path / "ig_store")
    index = str(tmp_path / "ig_index")
    ck = tmp_path / "ig_ck"

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    near = "quick brown fox jumps over the lazy dog near the river bank"
    other = "completely unrelated text about catalyst physical plan pruning rules"

    gate_metrics: list = []

    def run():
        stream = spark.readStream.schema("doc_id long, text string").json(str(src))
        q = start_neardup_gate_sink_indexed(
            stream, store, index, str(ck), threshold=0.5, available_now=True,
            on_metrics=lambda bid, m: gate_metrics.append((bid, m)),
            index_arrays=True,  # full-index mode: the arrays mirror below
        )
        q.awaitTermination(120)
        return sorted(r["doc_id"] for r in spark.read.parquet(store).collect())

    # batch 0: batch-internal near-dup collapses (lower id wins)
    _write_batch(src, [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": near},
        {"doc_id": 3, "text": other},
    ])
    assert run() == [1, 3]

    # batch 1 (same checkpoint): near-dup of STORED doc rejected via the
    # index; novel doc admitted
    _write_batch(src, [
        {"doc_id": 10, "text": near},
        {"doc_id": 11, "text": "fresh novel content with entirely new vocabulary tokens"},
    ])
    assert run() == [1, 3, 11]

    # crash state: batch 1's side effects applied, commit marker gone
    commit1 = ck / "commits" / "1"
    assert commit1.exists()
    commit1.unlink()
    crc = ck / "commits" / ".1.crc"
    if crc.exists():
        crc.unlink()

    # restart from the same checkpoint: batch 1 replays onto its own
    # partitions — store converges to the single-run result
    assert run() == [1, 3, 11]

    # the index mirrors the admitted set exactly (one arrays row per doc)
    arr = spark.read.parquet(f"{index}/arrays")
    assert sorted(r["doc_id"] for r in arr.collect()) == [1, 3, 11]

    # the metrics channel fired per batch incl. the replayed one; no
    # bucket exceeded the cap on this corpus
    assert len(gate_metrics) >= 3
    assert all(m["oversized_buckets"] == 0 for _, m in gate_metrics)


def test_indexed_gate_hybrid_mode_matches_and_skips_arrays_store(spark, tmp_path):
    """index_arrays=False (the default hybrid): candidates come from the
    persisted band rows, verify shingles re-derive from store TEXT — same
    admissions as the full-index mode, and no arrays store is written."""
    import os

    from mbgspark.streaming import start_neardup_gate_sink_indexed

    src = tmp_path / "hg_src"
    store = str(tmp_path / "hg_store")
    index = str(tmp_path / "hg_index")
    ck = str(tmp_path / "hg_ck")

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    near = "quick brown fox jumps over the lazy dog near the river bank"

    def run():
        stream = spark.readStream.schema("doc_id long, text string").json(str(src))
        q = start_neardup_gate_sink_indexed(
            stream, store, index, ck, threshold=0.5, available_now=True,
            index_arrays=False,
        )
        q.awaitTermination(120)
        return sorted(r["doc_id"] for r in spark.read.parquet(store).collect())

    _write_batch(src, [{"doc_id": 1, "text": base}])
    assert run() == [1]
    _write_batch(src, [
        {"doc_id": 10, "text": near},  # near-dup of stored doc: rejected
        {"doc_id": 11, "text": "fresh novel content with entirely new vocabulary tokens"},
    ])
    assert run() == [1, 11]
    assert os.path.isdir(f"{index}/bands")
    assert not os.path.exists(f"{index}/arrays")


def test_indexed_gate_recovers_from_first_batch_partial_write(spark, tmp_path):
    """ADVICE r5 (medium): a crash during the FIRST batch can leave a
    subset of the gate's three output paths on disk (here: bands written,
    store/arrays not — the pre-fix trigger ordering). The replay must NOT
    take the indexed branch and die on a path-does-not-exist read; it
    falls back to the self-contained branch (equivalent for batch 0) and
    converges to the correct store in both hybrid and full-index modes."""
    from pyspark.sql import functions as F

    from mbgspark.operators.dedup import build_minhash_index
    from mbgspark.streaming import (
        start_neardup_gate_sink_indexed,
        write_gate_meta,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    near = "quick brown fox jumps over the lazy dog near the river bank"

    for mode_arrays in (False, True):
        tag = "full" if mode_arrays else "hybrid"
        src = tmp_path / f"pb_src_{tag}"
        store = str(tmp_path / f"pb_store_{tag}")
        index = str(tmp_path / f"pb_index_{tag}")
        ck = str(tmp_path / f"pb_ck_{tag}")

        # simulate the crash remnant: batch 0's bands partition exists,
        # nothing else does. The meta sidecar is ALWAYS present in this
        # window (r7: the gate records it at first contact, before any
        # data write), so the remnant includes it.
        write_gate_meta(
            spark,
            index,
            {"layout": "bucketed-v1", "num_buckets": 64,
             "index_arrays": mode_arrays},
        )
        remnant = spark.createDataFrame(
            [(1, base), (3, "completely unrelated text about plan pruning")],
            "doc_id long, text string",
        )
        b_bands, _ = build_minhash_index(remnant, "doc_id", "text")
        (
            b_bands.withColumn("__gate_batch", F.lit(0))
            .withColumn(
                "__bucket", F.pmod(F.xxhash64("band_idx", "band_key"), F.lit(64))
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__gate_batch", "__bucket")
            .parquet(f"{index}/bands")
        )

        _write_batch(src, [
            {"doc_id": 1, "text": base},
            {"doc_id": 2, "text": near},
            {"doc_id": 3, "text": "completely unrelated text about plan pruning"},
        ])
        stream = spark.readStream.schema("doc_id long, text string").json(str(src))
        q = start_neardup_gate_sink_indexed(
            stream, store, index, ck, threshold=0.5, available_now=True,
            index_arrays=mode_arrays,
        )
        q.awaitTermination(120)
        got = sorted(r["doc_id"] for r in spark.read.parquet(store).collect())
        assert got == [1, 3], f"mode index_arrays={mode_arrays}: {got}"
        # the replayed batch 0 overwrote the remnant partition in place
        bands = spark.read.parquet(f"{index}/bands")
        assert bands.select("__gate_batch").distinct().collect()[0][0] == 0


def test_compact_gate_store_preserves_gate_semantics(spark, tmp_path):
    """compact_gate_store folds every __gate_batch partition into the -1
    base generation: file count drops, the gate keeps rejecting near-dups
    of pre-compaction admissions (the < N read contract still sees the
    base), and the final store matches the uncompacted twin run. Also
    pins the staged-swap crash recovery: a committed staging dir left by
    a crashed call is adopted, not rebuilt."""
    import glob
    import os

    from mbgspark.streaming import (
        compact_gate_store,
        start_neardup_gate_sink_indexed,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    near = "quick brown fox jumps over the lazy dog near the river bank"
    batches = [
        [{"doc_id": 1, "text": base},
         {"doc_id": 2, "text": "unrelated text about catalyst plan pruning"}],
        [{"doc_id": 10, "text": "fresh novel content with new vocabulary"}],
        # post-compaction batch: near-dup of a PRE-compaction admission
        [{"doc_id": 20, "text": near},
         {"doc_id": 21, "text": "another entirely different document body"}],
    ]

    def run(root, upto, compact_after=None):
        store, index, ck = f"{root}/store", f"{root}/index", f"{root}/ck"
        for i in range(upto):
            _write_batch(tmp_path / f"{os.path.basename(root)}_src{i}", [])
            src = tmp_path / f"{os.path.basename(root)}_src"
            os.makedirs(src, exist_ok=True)
            with open(src / f"b{i}.json", "w") as f:
                for d in batches[i]:
                    import json as _json

                    f.write(_json.dumps(d) + "\n")
            q = start_neardup_gate_sink_indexed(
                spark.readStream.schema("doc_id long, text string").json(str(src)),
                store, index, ck, threshold=0.5, available_now=True,
            )
            q.awaitTermination(120)
            if compact_after is not None and i == compact_after:
                for p in (store, f"{index}/bands", f"{index}/arrays"):
                    assert compact_gate_store(spark, p) >= 1
        return sorted(r["doc_id"] for r in spark.read.parquet(store).collect())

    plain = run(str(tmp_path / "nc"), 3)
    compacted = run(str(tmp_path / "cc"), 3, compact_after=1)
    assert plain == compacted == [1, 2, 10, 21]  # 20 rejected vs base

    # compaction actually shrank the file count
    n_cc = len(glob.glob(f"{tmp_path}/cc/index/bands/**/*.parquet", recursive=True))
    n_nc = len(glob.glob(f"{tmp_path}/nc/index/bands/**/*.parquet", recursive=True))
    assert n_cc < n_nc

    # crash recovery: a COMMITTED staging snapshot (what a crashed call
    # leaves between its manifest write and the swap) is adopted, not
    # rebuilt — and the adoption's deletes are scoped to the manifest
    # (ADVICE r6): a batch dir written AFTER the snapshot (a restarted
    # stream between the crash and the retry) must survive with its data.
    import json as _json

    store = f"{tmp_path}/cc/store"
    staging = store + ".__compact_staging"
    rows_before = sorted(
        r["doc_id"] for r in spark.read.parquet(store).collect()
    )
    dirs_before = [
        d for d in os.listdir(store) if d.startswith("__gate_batch=")
    ]
    (
        spark.read.parquet(store)
        .drop("__gate_batch")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(staging)
    )
    assert os.path.exists(f"{staging}/_SUCCESS")
    with open(f"{staging}/_COMPACT_MANIFEST.json", "w") as f:
        _json.dump({"dirs": dirs_before}, f)
    # post-crash, pre-retry: the restarted stream admitted one more batch
    spark.createDataFrame(
        [(99, "a wholly new post crash document body")],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(f"{store}/__gate_batch=7")
    assert compact_gate_store(spark, store) == 0  # adopted, not rebuilt
    back = sorted(r["doc_id"] for r in spark.read.parquet(store).collect())
    assert back == sorted(rows_before + [99])  # post-snapshot batch survived
    # a second call now folds the surviving batch dir into the base
    assert compact_gate_store(spark, store) >= 1


def test_compact_incomplete_staging_discarded_and_rebuilt(spark, tmp_path):
    """A staging dir missing the manifest (crash between the parquet
    write and the manifest write) is an incomplete remnant: discarded and
    the compaction rebuilt from the live batch dirs — never adopted with
    an unknown snapshot scope."""
    import os

    from mbgspark.streaming import compact_gate_store

    store = str(tmp_path / "inc_store")
    spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    ).write.parquet(f"{store}/__gate_batch=0")
    staging = store + ".__compact_staging"
    # committed parquet (has _SUCCESS) but NO manifest
    spark.createDataFrame(
        [(50, "stale snapshot row")], "doc_id long, text string"
    ).coalesce(1).write.parquet(staging)
    assert os.path.exists(f"{staging}/_SUCCESS")
    assert compact_gate_store(spark, store) == 1  # rebuilt, not adopted
    got = sorted(r["doc_id"] for r in spark.read.parquet(store).collect())
    assert got == [1, 2]  # the stale snapshot's row never surfaced
    assert not os.path.exists(staging)


def test_indexed_gate_meta_validates_restart_params(spark, tmp_path):
    """ADVICE r6 (medium): num_buckets and index_arrays are baked into
    the on-disk index layout, so the gate persists them in
    _gate_meta.json on first contact and a restart with different values
    fails fast instead of silently probing the wrong buckets or
    silently admitting near-dups."""
    import json as _json

    import pytest
    from pyspark.errors import StreamingQueryException

    from mbgspark.streaming import start_neardup_gate_sink_indexed

    src = tmp_path / "mv_src"
    store = str(tmp_path / "mv_store")
    index = str(tmp_path / "mv_index")

    def run(ck_tag, **kw):
        stream = spark.readStream.schema("doc_id long, text string").json(str(src))
        q = start_neardup_gate_sink_indexed(
            stream, store, index, str(tmp_path / ck_tag), threshold=0.5,
            available_now=True, **kw,
        )
        q.awaitTermination(120)

    _write_batch(src, [{"doc_id": 1, "text": "the quick brown fox jumps over"}])
    run("mv_ck0", num_buckets=64, index_arrays=True)
    with open(f"{index}/_gate_meta.json") as f:
        meta = _json.load(f)
    assert meta == {
        "layout": "bucketed-v1", "num_buckets": 64, "index_arrays": True,
    }

    _write_batch(src, [{"doc_id": 2, "text": "entirely new second document"}])
    with pytest.raises(StreamingQueryException, match="num_buckets=64"):
        run("mv_ck1", num_buckets=32, index_arrays=True)
    with pytest.raises(StreamingQueryException, match="index_arrays=True"):
        run("mv_ck2", num_buckets=64, index_arrays=False)
    # matching params keep working
    run("mv_ck3", num_buckets=64, index_arrays=True)
    got = sorted(r["doc_id"] for r in spark.read.parquet(store).collect())
    assert got == [1, 2]


def test_indexed_gate_adopts_unbucketed_legacy_index(spark, tmp_path):
    """ADVICE r6 (medium): a pre-bucketing index store (no __bucket=
    dirs, no meta) must not stall the stream with an unresolved-column
    read. The gate detects the legacy layout, adopts it (unpruned reads,
    un-bucketed writes — correct, just not pruned), records the adoption
    in a new meta file, and keeps rejecting near-dups of the legacy
    corpus."""
    import json as _json
    import os

    from pyspark.sql import functions as F

    from mbgspark.operators.dedup import build_minhash_index
    from mbgspark.streaming import start_neardup_gate_sink_indexed

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    near = "quick brown fox jumps over the lazy dog near the river bank"

    src = tmp_path / "lg_src"
    store = str(tmp_path / "lg_store")
    index = str(tmp_path / "lg_index")

    # legacy store: flat batch partitions, NO __bucket sub-dirs, no meta
    legacy = spark.createDataFrame(
        [(1, base), (2, "some unrelated legacy corpus document")],
        "doc_id long, text string",
    )
    legacy.withColumn("__gate_batch", F.lit(-1)).write.partitionBy(
        "__gate_batch"
    ).parquet(store)
    bands, arrays = build_minhash_index(legacy, "doc_id", "text")
    bands.withColumn("__gate_batch", F.lit(-1)).write.partitionBy(
        "__gate_batch"
    ).parquet(f"{index}/bands")
    arrays.withColumn("__gate_batch", F.lit(-1)).write.partitionBy(
        "__gate_batch"
    ).parquet(f"{index}/arrays")

    _write_batch(src, [
        {"doc_id": 10, "text": near},  # near-dup of LEGACY corpus doc
        {"doc_id": 11, "text": "fresh novel content with new vocabulary"},
    ])
    q = start_neardup_gate_sink_indexed(
        spark.readStream.schema("doc_id long, text string").json(str(src)),
        store, index, str(tmp_path / "lg_ck"), threshold=0.5,
        available_now=True, index_arrays=True,
    )
    q.awaitTermination(120)
    got = sorted(r["doc_id"] for r in spark.read.parquet(store).collect())
    assert got == [1, 2, 11]  # 10 rejected against the legacy corpus
    with open(f"{index}/_gate_meta.json") as f:
        assert _json.load(f)["layout"] == "unbucketed-v0"
    # writes stayed layout-consistent: no __bucket dirs appeared
    assert not any(
        "__bucket=" in d
        for root_, dirs_, _ in os.walk(f"{index}/bands")
        for d in dirs_
    )


def test_indexed_gate_legacy_error_paths(spark, tmp_path):
    """The two un-adoptable legacy shapes fail fast with migration
    instructions instead of silently breaking dedup: (a) bands-only
    legacy + index_arrays=True (pre-upgrade corpus candidates would
    silently drop out of the verify join); (b) bucketed dirs with no
    recorded modulus (pruning under a guessed num_buckets silently
    misses near-dups)."""
    import pytest
    from pyspark.errors import StreamingQueryException
    from pyspark.sql import functions as F

    from mbgspark.operators.dedup import build_minhash_index
    from mbgspark.streaming import start_neardup_gate_sink_indexed

    legacy = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    bands, _ = build_minhash_index(legacy, "doc_id", "text")

    def run(store, index, ck, **kw):
        src = tmp_path / f"{ck}_src"
        _write_batch(src, [{"doc_id": 5, "text": "whatever new document"}])
        q = start_neardup_gate_sink_indexed(
            spark.readStream.schema("doc_id long, text string").json(str(src)),
            str(tmp_path / store), str(tmp_path / index),
            str(tmp_path / ck), available_now=True, **kw,
        )
        q.awaitTermination(120)

    # (a) legacy bands-only, no arrays, started with index_arrays=True
    bands.withColumn("__gate_batch", F.lit(-1)).write.partitionBy(
        "__gate_batch"
    ).parquet(str(tmp_path / "la_index" / "bands"))
    with pytest.raises(StreamingQueryException, match="index_arrays=False"):
        run("la_store", "la_index", "la_ck", index_arrays=True)

    # (b) bucketed layout, no meta recording the modulus
    (
        bands.withColumn("__gate_batch", F.lit(-1))
        .withColumn(
            "__bucket", F.pmod(F.xxhash64("band_idx", "band_key"), F.lit(64))
        )
        .write.partitionBy("__gate_batch", "__bucket")
        .parquet(str(tmp_path / "lb_index" / "bands"))
    )
    with pytest.raises(StreamingQueryException, match="_gate_meta.json"):
        run("lb_store", "lb_index", "lb_ck", index_arrays=False)


def test_indexed_gate_auto_compaction(spark, tmp_path):
    """VERDICT r6 item 3: compact_every triggers compact_gate_store from
    inside the gate once enough live batch partitions accumulate — final
    store contents identical to the no-compaction twin, file state folded
    into the __gate_batch=-1 base."""
    import os

    from mbgspark.streaming import start_neardup_gate_sink_indexed

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    near = "quick brown fox jumps over the lazy dog near the river bank"
    batches = [
        [{"doc_id": 1, "text": base}],
        [{"doc_id": 10, "text": "fresh novel content with new vocabulary"}],
        # post-compaction batch: near-dup of a folded admission
        [{"doc_id": 20, "text": near},
         {"doc_id": 21, "text": "another entirely different document body"}],
    ]

    def run(tag, compact_every):
        store = str(tmp_path / f"{tag}_store")
        src = tmp_path / f"{tag}_src"
        for i, rows in enumerate(batches):
            os.makedirs(src, exist_ok=True)
            import json as _json

            with open(src / f"b{i}.json", "w") as f:
                for d in rows:
                    f.write(_json.dumps(d) + "\n")
            q = start_neardup_gate_sink_indexed(
                spark.readStream.schema("doc_id long, text string").json(str(src)),
                store, str(tmp_path / f"{tag}_index"),
                str(tmp_path / f"{tag}_ck"), threshold=0.5,
                available_now=True, compact_every=compact_every,
            )
            q.awaitTermination(120)
        return store, sorted(
            r["doc_id"] for r in spark.read.parquet(store).collect()
        )

    _, plain = run("ac_off", None)
    store_on, compacted = run("ac_on", 2)
    assert plain == compacted == [1, 10, 21]  # 20 rejected vs folded base
    # the fold actually happened: a -1 base exists in the store
    assert os.path.isdir(f"{store_on}/__gate_batch=-1")


def test_streaming_etl_lifecycle_matches_batch_twin(spark, tmp_path):
    """VERDICT r6 item 5: the one-call streaming lifecycle surface
    (read_tweet_stream → run_etl → merge sink) parity-pinned against the
    BATCH lifecycle on the same fixture — same rows, same columns, same
    locate/label decisions, with the stream's re-delivered tweet resolved
    by keep-latest exactly like the batch merge would."""
    from mbgspark.operators.dedup import keep_latest_per_key
    from mbgspark.pipeline import run_etl
    from mbgspark.schema import DEFAULT_LOCATIONS, TWEET_RAW_SCHEMA
    from mbgspark.streaming import start_etl_lifecycle_sink

    t1 = {
        "_id": "1", "text": "pelayanan di bandung sangat bagus dan sehat",
        "created_at": "2025-01-01T10:00:00Z",
        "scraped_at": "2025-01-01T11:00:00Z", "tweet_url": "u1",
        "author_handle": "h1", "author_name": "alice", "location": None,
        "reply_count": 1, "retweet_count": 0, "like_count": 1,
    }
    t2 = {
        "_id": "2", "text": "program gagal total di jakarta selatan, buruk",
        "created_at": "2025-01-02T09:00:00Z",
        "scraped_at": "2025-01-02T09:30:00Z", "tweet_url": "u2",
        "author_handle": "h2", "author_name": "bob", "location": None,
        "reply_count": 0, "retweet_count": 2, "like_count": 0,
    }
    t3 = {
        "_id": "3", "text": "no location mentioned at all here",
        "created_at": "2025-01-02T12:00:00Z",
        "scraped_at": "2025-01-02T12:30:00Z", "tweet_url": "u3",
        "author_handle": "h3", "author_name": "carol", "location": None,
        "reply_count": 0, "retweet_count": 0, "like_count": 3,
    }
    t1b = {**t1, "like_count": 9, "scraped_at": "2025-01-01T12:00:00Z"}

    src = tmp_path / "lc_src"
    store = str(tmp_path / "lc_store")
    ck = str(tmp_path / "lc_ck")

    _write_batch(src, [t1, t2])
    q = start_etl_lifecycle_sink(
        spark, str(src), store, ck, available_now=True
    )
    q.awaitTermination(120)
    # second delivery on the same checkpoint: novel tweet + re-delivery
    _write_batch(src, [t3, t1b])
    q = start_etl_lifecycle_sink(
        spark, str(src), store, ck, available_now=True
    )
    q.awaitTermination(120)

    # batch twin on the SAME fixture files = the oracle
    batch_raw = spark.read.schema(TWEET_RAW_SCHEMA).json(
        str(src), multiLine=False
    )
    twin = keep_latest_per_key(
        run_etl(batch_raw, spark.createDataFrame(
            DEFAULT_LOCATIONS,
            "province string, city string, dict_order int, term string",
        )),
        key="_id", order_col="scraped_at",
    )

    got_df = spark.read.parquet(store)
    cols = sorted(twin.columns)
    assert sorted(got_df.columns) == cols
    norm = lambda df: sorted(
        map(tuple, df.select(*[F.col(c).cast("string") for c in cols]).collect())
    )
    got, want = norm(got_df), norm(twin)
    assert got == want
    # the lifecycle actually enriched: locate + label happened
    by_id = {r[cols.index("_id")]: r for r in got}
    assert by_id["1"][cols.index("city")] == "bandung"
    assert by_id["2"][cols.index("city")] == "jakarta selatan"
    assert by_id["3"][cols.index("city")] is None
    assert by_id["1"][cols.index("like_count")] == "9"  # keep-latest won


def test_compact_target_files_builds_directory_shaped_base(spark, tmp_path):
    """VERDICT r9 item 5 plumbing: ``compact_gate_store(target_files=N)``
    with N > 1 folds the flat store into a base generation of exactly N
    part files (the 100 TB directory shape), content-identical to the
    single-file fold."""
    import os

    from mbgspark.streaming import compact_gate_store

    def seed(tag):
        store = str(tmp_path / f"{tag}_store")
        for b in range(3):
            spark.range(b * 100, b * 100 + 100).selectExpr(
                "id AS doc_id", "concat('body ', id) AS text"
            ).write.mode("overwrite").parquet(f"{store}/__gate_batch={b}")
        return store

    single, multi = seed("single"), seed("multi")
    assert compact_gate_store(spark, single) == 3
    assert compact_gate_store(spark, multi, target_files=4) == 3

    def parts(store):
        base = f"{store}/__gate_batch=-1"
        return sorted(f for f in os.listdir(base) if f.endswith(".parquet"))

    assert len(parts(single)) == 1
    assert len(parts(multi)) == 4
    a = spark.read.parquet(single).drop("__gate_batch")
    b = spark.read.parquet(multi).drop("__gate_batch")
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(
        r["doc_id"] for r in b.collect()
    )


def test_merge_sink_max_records_per_file_bounds_day_files(spark, tmp_path):
    """``start_merge_sink(max_records_per_file=...)`` flows to the store
    writer: a day partition splits into ceil(rows/bound) part files —
    the many-part directory shape — while keyed merge semantics hold."""
    import os

    src = tmp_path / "src_mrpf"
    rows = [
        {**R1, "_id": str(i), "scraped_at": "2025-01-01T11:00:00Z"}
        for i in range(6)
    ]
    _write_batch(src, rows)
    store = str(tmp_path / "store_mrpf")
    q = start_merge_sink(
        read_tweet_stream(spark, str(src)),
        store,
        str(tmp_path / "ck_mrpf"),
        available_now=True,
        max_records_per_file=2,
    )
    q.awaitTermination(120)
    day = f"{store}/event_date=2025-01-01"
    files = [f for f in os.listdir(day) if f.endswith(".parquet")]
    assert len(files) == 3  # 6 rows / 2 per file
    assert spark.read.parquet(store).count() == 6
