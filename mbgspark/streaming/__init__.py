"""Structured Streaming parity — SURVEY.md §2.10 X5–X8.

The reference's "resilient continue-from-last" loop (resilient_etl.py:
176-662) — skip-processed days, re-run upserts, recover from crashes — maps
to Structured Streaming primitives:

- X5 resumable ingest  = file source + checkpointing + idempotent
  foreachBatch merge (exactly-once replaces retry-and-upsert).
- X6 daily tumbling window = ``window(created_at, '1 day')``.
- X7 late data = event-time columns + watermark bounding state, never
  dropping data inside the `days_back` horizon (config/config.json:7).
- X8 cross-batch dedup = ``dropDuplicatesWithinWatermark`` (state-store
  backed analog of the session-lifetime seen-id sets,
  resilient_scraper.py:55-56).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from mbgspark import jvmseam
from mbgspark.io import merge_by_key, write_partitioned
from mbgspark.operators.dedup import keep_latest_per_key
from mbgspark.schema import TWEET_RAW_SCHEMA


def _store_exists(spark: SparkSession, path: str) -> bool:
    """True iff the store path exists on the session's Hadoop filesystem —
    the explicit check that replaces catch-any-exception-as-missing."""
    fs, p = jvmseam.hadoop_fs(spark, path)
    return bool(fs.exists(p))


def _fs_for(spark: SparkSession, path: str):
    return jvmseam.hadoop_fs(spark, path)


def _read_small_file(spark: SparkSession, path: str) -> str | None:
    """Read a small sidecar file (meta/manifest JSON) through the Hadoop
    FS API so the gate's metadata travels with the store on any
    filesystem (local, HDFS, object store), not just the driver's."""
    return jvmseam.fs_read_utf8(spark, path)


def _write_small_file(spark: SparkSession, path: str, data: str) -> None:
    jvmseam.fs_write_utf8(spark, path, data)


#: Sidecar filename at the index root recording the gate's on-disk layout
#: contract: ``{"layout": "bucketed-v1"|"unbucketed-v0",
#: "num_buckets": int|null, "index_arrays": bool}``. ``num_buckets`` is a
#: MODULUS baked into every ``__bucket`` directory name — restarting with
#: a different value would probe the wrong buckets and silently miss
#: near-dups, so it is persisted on first write and validated on every
#: restart instead of trusted as a parameter (ADVICE r6).
GATE_META_FILE = "_gate_meta.json"


def read_gate_meta(spark: SparkSession, index_path: str) -> dict | None:
    import json

    raw = _read_small_file(
        spark, index_path.rstrip("/") + "/" + GATE_META_FILE
    )
    return None if raw is None else json.loads(raw)


def write_gate_meta(spark: SparkSession, index_path: str, meta: dict) -> None:
    import json

    _write_small_file(
        spark, index_path.rstrip("/") + "/" + GATE_META_FILE, json.dumps(meta)
    )


def read_tweet_stream(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """X5 ingest source: JSON micro-batch files of flat scrape records.
    maxFilesPerTrigger is the pacing analog of the reference's per-page cap
    (O3, max_per_page=50)."""
    reader = spark.readStream.schema(TWEET_RAW_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def dedup_stream(df: DataFrame, watermark: str = "30 days") -> DataFrame:
    """X8: keyed dedup across micro-batches; watermark bounds the seen-key
    state (≈ days_back horizon, config/config.json:7)."""
    return df.withWatermark("created_at", watermark).dropDuplicatesWithinWatermark(["_id"])


def daily_counts_stream(df: DataFrame, watermark: str | None = None) -> DataFrame:
    """X6/X7: tumbling 1-day event-time window; late rows land in their
    event-time day as long as they're inside the watermark horizon.

    Pass ``watermark=None`` when the upstream (e.g. dedup_stream) already
    set one — Spark disallows redefining it mid-pipeline."""
    if watermark:
        df = df.withWatermark("created_at", watermark)
    return (
        df.groupBy(F.window("created_at", "1 day").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("day_start"), "cnt")
    )


def session_counts_stream(
    df: DataFrame,
    key_col: str = "author_handle",
    gap: str = "30 minutes",
    watermark: str = "1 day",
) -> DataFrame:
    """Event-time sessionization on a live stream: per-key activity bursts
    separated by ``gap`` of silence become one session row (the streaming
    twin of the batch ``sessionize_events`` gaps-and-islands query).
    ``session_window`` merges overlapping state across micro-batches; the
    watermark both bounds that state and decides when a session is final
    (append mode emits a session only once it can no longer grow)."""
    return (
        df.withWatermark("created_at", watermark)
        .groupBy(F.col(key_col), F.session_window("created_at", gap).alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "cnt",
        )
    )


def stateful_author_counts(
    stream: DataFrame,
    key_col: str = "author_handle",
) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState`` — the
    Spark-native version of the reference's session-lifetime per-author
    accumulators (A6 running totals, resilient_scraper.py:1272-1274), but
    with durable state: counts survive micro-batch boundaries AND query
    restarts through the checkpoint's state store.

    State per key: (total count, like sum). Each micro-batch emits the
    updated running totals for the keys it touched (update semantics).
    Uses NoTimeout — the key space is bounded (authors); swap in
    ProcessingTimeTimeout for unbounded keys needing TTL eviction."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = f"{key_col} string, total_cnt bigint, total_likes bigint"
    state_schema = "cnt bigint, likes bigint"

    def update(key, pdfs, state: GroupState):
        rows = 0
        likes = 0
        for pdf in pdfs:
            rows += len(pdf)
            likes += int(pd.to_numeric(pdf["like_count"], errors="coerce").fillna(0).sum())
        if state.exists:
            (cnt0, likes0) = state.get
        else:
            cnt0, likes0 = 0, 0
        state.update((cnt0 + rows, likes0 + likes))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "total_cnt": [cnt0 + rows],
                "total_likes": [likes0 + likes],
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_merge_sink(
    stream: DataFrame,
    store_path: str,
    checkpoint_path: str,
    key: str = "_id",
    available_now: bool = False,
    max_records_per_file: int = 5_000_000,
) -> StreamingQuery:
    """X5 idempotent sink: per-micro-batch MERGE into the partitioned store.

    foreachBatch + keep-latest merge + dynamic partition overwrite ⇒ replayed
    batches (crash recovery) converge to the same store state — the
    exactly-once analog of Mongo upsert (resilient_scraper.py:944-972).

    ``max_records_per_file`` flows to ``write_partitioned``: at 100 TB a
    hot day is MANY part files under its partition directory, a store
    shape the bound produces automatically; the soak harness lowers it
    to force that directory shape at test scale (tools/merge_soak.py)."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.withColumn(
            "event_date", F.date_format("created_at", "yyyy-MM-dd")
        )
        # Only a genuinely-missing store means "first batch"; any other read
        # failure (transient FS error, corrupt footer) must surface, not
        # silently drop previously stored rows via the overwrite below.
        if _store_exists(spark, store_path):
            existing = spark.read.parquet(store_path)
            # Partition-scoped merge: the window only needs to see store rows
            # in the partitions this batch touches (a re-delivered key keeps
            # its created_at, hence its partition — same contract as the
            # reference's per-day collections, utils.py:583-584). The isin
            # filter prunes at the store scan, so merge cost tracks touched
            # days, not store size; dynamic partition overwrite then replaces
            # only those same days.
            merged = merge_by_key(
                existing,
                batch_df,
                key=key,
                order_col="scraped_at",
                partition_col="event_date",
            )
        else:
            # no store yet — still dedup re-delivered keys within the batch
            merged = keep_latest_per_key(batch_df, key=key, order_col="scraped_at")
        write_partitioned(
            merged,
            store_path,
            "event_date",
            max_records_per_file=max_records_per_file,
        )

    writer = stream.writeStream.foreachBatch(_merge).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_etl_lifecycle_sink(
    spark: SparkSession,
    source_path: str,
    store_path: str,
    checkpoint_path: str,
    dim: DataFrame | list | None = None,
    available_now: bool = False,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """§3.1 end-to-end as ONE streaming surface — the streaming twin of
    the reference's resilient per-day loop (resilient_etl.py:176-431):
    ``read_tweet_stream`` → clean → lexicon label → event_date → locate →
    idempotent keyed merge sink. The transform lineage is ``run_etl``
    ITSELF — batch and streaming lifecycles share one code path, so the
    batch output is the streaming oracle (parity-pinned in
    test_streaming), and every strategy decision inside it (compiled
    location map, no-UDF cleaning, lexicon labeling) applies unchanged.
    The only stream-specific step is pre-collecting the broadcast-sized
    locations dim: ``detect_locations`` collects a batch dim lazily, but
    a streaming plan must not embed a collect — the dim rows are resolved
    here, once, before the stream starts. Exactly-once is the merge
    sink's: keyed keep-latest upsert per micro-batch, so re-delivered
    tweets update in place and crash replays converge."""
    from mbgspark.pipeline import locations_dim, run_etl

    if dim is None:
        dim = locations_dim(spark)
    dim_rows = dim.collect() if isinstance(dim, DataFrame) else dim
    stream = read_tweet_stream(spark, source_path, max_files_per_trigger)
    transformed = run_etl(stream, dim_rows)
    return start_merge_sink(
        transformed, store_path, checkpoint_path, available_now=available_now
    )


def start_neardup_gate_sink(
    stream: DataFrame,
    store_path: str,
    checkpoint_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
    available_now: bool = False,
    on_metrics=None,
) -> StreamingQuery:
    """Streaming near-duplicate ingest gate: each micro-batch is checked
    against the accumulated store with ``minhash_near_dups_incremental``
    (corpus-corpus pairs never regenerated — per-batch cost tracks the
    batch) and against itself; only novel documents are appended. The
    training-data composition of X5 (resumable ingest) with the
    incremental dedup operator: a crawler feeding a 100 TB corpus admits
    a document exactly once. Replay convergence comes from the gate
    itself, not the sink: a re-delivered batch's docs are exact dups of
    their already-stored copies (jaccard 1.0 ≥ any threshold), so the
    replay appends nothing — the store is a fixpoint of the gate.

    Dedup policy: a batch doc near-dupping ANY store doc is dropped; for
    batch-internal pairs the lower id survives (greedy, matching the
    keep-first convention of the batch dedup operators). At production
    scale the store side runs against the persisted MinHash index
    (``build_minhash_index``) instead of re-reading raw text — BUT note
    the index must be appended in the same foreachBatch as the store
    (each admitted batch's band rows + shingle arrays), because a static
    index goes stale against the growing store and a later batch would
    re-admit near-dups of earlier admissions. That index-maintaining
    variant is a composition of this gate with
    ``minhash_near_dups_incremental(corpus_index=…)`` + two appends; the
    self-contained re-read here is the bounded-gate-SF form.

    ``on_metrics(batch_id, {"oversized_buckets": n, "oversized_rows": n})``
    surfaces the LSH bucket-cap drops per micro-batch (VERDICT r4 item 4)
    — the one-row global metrics frame (``metrics_out``, the
    AQE-elimination-proof shape; see ``lsh_candidate_pairs``) is
    crossJoined into each batch's survivors and observed there, so the
    numbers ride the batch's own append action; a viral mega-cluster
    arriving on the stream shows up in the gate's metrics channel the
    batch it lands. An all-duplicates batch (routine under checkpoint
    replay — the store is a fixpoint of the gate) appends zero rows,
    which empty-folds the ride-along; that path falls back to evaluating
    the metrics aggregate directly, so reported counts are always true.
    Be honest about its cost: the aggregate's lineage is the
    batch+corpus band-bucket frame, i.e. the same order of work as the
    gate check itself — a zero-append batch with on_metrics wired pays
    roughly 2× (second corpus pass in self-contained mode). Leave
    on_metrics unset on replay-heavy deployments, or wire the persisted
    MinHash index so both the gate and the metrics read the index
    instead of re-shingling the store."""
    from mbgspark.operators.dedup import (
        minhash_near_dups,
        minhash_near_dups_incremental,
        observed_or_direct,
    )

    def _gate(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Observation

        spark = batch_df.sparkSession
        batch_df = batch_df.dropDuplicates([id_col])
        slim = batch_df.select(id_col, text_col)
        metrics: list[DataFrame] = [] if on_metrics else None
        if _store_exists(spark, store_path):
            corpus = spark.read.parquet(store_path).select(id_col, text_col)
            pairs = minhash_near_dups_incremental(
                slim, corpus, id_col, text_col, threshold=threshold,
                metrics_out=metrics,
            )
            drop_ids = (
                pairs.filter(F.col("match_source") == "corpus")
                .select(F.col("id_a").alias(id_col))
                .unionByName(
                    pairs.filter(F.col("match_source") == "batch")
                    .select(F.col("id_b").alias(id_col))
                )
                .distinct()
            )
        else:
            pairs = minhash_near_dups(
                slim, id_col, text_col, threshold=threshold,
                metrics_out=metrics,
            )
            drop_ids = pairs.select(F.col("id_b").alias(id_col)).distinct()
        survivors = batch_df.join(drop_ids, id_col, "left_anti")
        obs = None
        if on_metrics:
            obs = Observation(f"neardup_gate_{batch_id}")
            mrow = metrics[0].observe(
                obs,
                F.max("oversized_buckets").alias("oversized_buckets"),
                F.max("oversized_rows").alias("oversized_rows"),
            )
            survivors = survivors.crossJoin(F.broadcast(mrow)).drop(
                "oversized_buckets", "oversized_rows"
            )
        survivors.write.mode("append").parquet(store_path)
        if obs is not None:
            # the ride-along can be folded away (AQE empty-relation
            # propagation when the batch appends zero rows) and the
            # metrics then never arrive. observed_or_direct probes the
            # JVM getRowOrEmpty AFTER the append action — present row:
            # normal decode; absent: evaluate the aggregate directly
            # (TRUE capped counts; cost caveat in the docstring — this
            # re-runs the band-bucket lineage). Real failures propagate
            # instead of being converted into a recompute (ADVICE r5).
            got = observed_or_direct(obs, metrics[0])
            on_metrics(
                batch_id,
                {
                    "oversized_buckets": got.get("oversized_buckets") or 0,
                    "oversized_rows": got.get("oversized_rows") or 0,
                },
            )

    writer = stream.writeStream.foreachBatch(_gate).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_neardup_gate_sink_indexed(
    stream: DataFrame,
    store_path: str,
    index_path: str,
    checkpoint_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.6,
    available_now: bool = False,
    on_metrics=None,
    index_arrays: bool = True,
    num_buckets: int = 64,
    compact_every: int | None = None,
    compact_target_files: int = 1,
) -> StreamingQuery:
    """The INDEX-MAINTAINING form of the near-dup ingest gate. Each
    batch:

    1. reads the persisted MinHash index — band rows + shingle arrays,
       the two ``build_minhash_index`` lineages — restricted by
       PARTITION PRUNING on two axes: batches strictly before this one
       (``__gate_batch < N``) AND the hash buckets this batch actually
       probes (``__band_bucket`` = hash of the band key for band rows;
       ``__id_bucket`` = hash of the doc id for shingle arrays, pruned
       to the CANDIDATES' buckets — near-dup candidates are rare, so
       the verify read touches a handful of bucket directories instead
       of the whole arrays store),
    2. generates candidates with ``incremental_candidate_pairs`` (batch
       × index band rows, never corpus × corpus; the corpus TEXT is
       never touched) and verifies them with ``verify_candidate_pairs``
       against the pruned arrays,
    3. writes the survivors to the store AND their own index rows to the
       index store — the store partitioned by ``__gate_batch`` = batch
       id, the index paths sub-partitioned by their bucket column — all
       with dynamic partition overwrite.

    Exactly-once without markers or swaps: every write is an IDEMPOTENT
    overwrite of this batch's own partition. A crash anywhere mid-batch
    leaves prior partitions untouched (the gate only ever reads
    ``__gate_batch < N``, so a half-written partition N is invisible to
    the replay's inputs); the replayed batch recomputes the identical
    survivor set from identical inputs — deterministic operators, same
    checkpoint offsets — and overwrites partition N in place. The one
    asymmetric window is the FIRST batch, where only a subset of the
    three paths may exist after a crash; the gate therefore takes the
    indexed branch only when every path that branch reads exists, and
    writes the branch-trigger path (bands) last (ADVICE r5). THAT
    mechanism — partition-idempotent multi-sink writes, the third
    exactly-once strategy in this module beside the merge sink's keyed
    upsert and the sketch store's staged swap — is this variant's
    distinctive value.

    MEASURED COST (see SCALE.md r6 row for the numbers of record): the
    r5 un-bucketed form LOST to the plain re-read gate (9.8 s full /
    7.6 s hybrid vs 6.9 s per batch at the 50k-doc stress) because its
    verify join scanned the whole shingle-array store (~4× raw text on
    disk) or re-scanned store text; bucket pruning removes exactly those
    scans — per-batch cost is now the batch lineage + a band-row read of
    the probed buckets + an arrays read of the CANDIDATE buckets only,
    so it no longer grows with store text size at all, and the margin
    over the plain gate widens as the store grows. Two driver-side
    collects per batch are bucket LISTS (≤ ``num_buckets`` values each),
    bounded metadata like the merge sink's touched-day list. Candidates
    are persisted for the batch (probed by the bucket collect, the
    verify join and all three writes) and unpersisted in a finally.

    ``index_arrays=False`` is the bands-only HYBRID: candidates from the
    pruned band index, verify shingles re-derived from store TEXT (full
    store scan — the r5 measured-cheaper side when arrays were unpruned;
    kept as the layout-compatibility mode for stores whose arrays index
    wasn't materialized). ``num_buckets`` trades pruning granularity
    against small-files overhead: each batch writes at most
    min(rows, num_buckets) files per index path.

    Store readers see one extra ``__gate_batch`` partition column
    (ingestion metadata — drop it or use it as arrival lineage). The
    index layout is ``{index_path}/bands`` (sub-partitioned by
    ``__band_bucket``) + ``{index_path}/arrays`` (sub-partitioned by
    ``__id_bucket``). Replay idempotence additionally holds at the
    CONTENT level like the plain gate's: re-delivered docs exact-match
    their indexed copies and are rejected. ``on_metrics`` is the plain
    gate's per-batch bucket-cap channel; under pruning its oversized
    counts cover the PROBED buckets — the only buckets where pair
    suppression can happen this batch — and its fallback evaluation is
    cheap by construction (the metrics lineage reads the index, not the
    corpus text).

    LAYOUT CONTRACT (ADVICE r6, both mediums): the bucketed layout and
    its modulus are load-bearing on-disk state, so the gate persists
    ``{index_path}/_gate_meta.json`` = ``{"layout", "num_buckets",
    "index_arrays"}`` on first contact and validates every restart
    against it — a restart with a different ``num_buckets`` or
    ``index_arrays`` fails fast instead of silently probing the wrong
    buckets / silently admitting near-dups of the pre-upgrade corpus.
    A meta-less store with existing band rows is a LEGACY index:
    un-bucketed legacy (pre-bucketing layout) is adopted in place —
    reads fall back to unpruned (correct, just not bucket-pruned),
    writes continue un-bucketed, and the adopted layout is recorded in
    a new meta file so the degradation is visible and permanent rather
    than re-detected; bucketed legacy (bucket dirs present, modulus
    unrecorded) fails fast with the migration instruction, because no
    parameter value can be trusted to match the unknown modulus.

    ``compact_every=N`` turns on in-line store maintenance: after a
    batch's writes, when the store holds ≥ N live batch partitions the
    gate folds store+index into the ``__gate_batch=-1`` base generation
    via ``compact_gate_store`` — safe mid-stream because foreachBatch is
    the store's only writer and compaction runs strictly between this
    batch's writes and the next batch's reads; a crash mid-compaction is
    healed by the manifest-scoped recovery on the next batch (or the
    next manual call). This bounds the long-running stream's file count
    at O(compact_every × buckets) instead of O(batches × buckets).
    ``compact_target_files`` sizes the folded FLAT-store base generation
    (bucketed index paths keep their bucket layout regardless): the
    default 1 suits test-scale stores, but a base generation one task
    can rewrite stops existing long before 100 TB — a production stream
    sets this to its store's natural part count so the fold stays a
    directory of parallel-written parts (the same many-files shape
    tools/make_split.py exercises on the batch side)."""
    from mbgspark.operators.dedup import (
        _oversized_metrics_row,
        build_minhash_index,
        incremental_candidate_pairs,
        minhash_near_dups,
        observed_or_direct,
        verify_candidate_pairs,
        with_shingle_array,
    )

    bands_path = index_path.rstrip("/") + "/bands"
    arrays_path = index_path.rstrip("/") + "/arrays"

    def _band_bucket() -> Column:
        return F.pmod(F.xxhash64("band_idx", "band_key"), F.lit(num_buckets))

    def _id_bucket(col_name: str) -> Column:
        return F.pmod(F.xxhash64(F.col(col_name)), F.lit(num_buckets))

    # Resolved once per query (the on-disk layout cannot change under a
    # running gate — the gate is the only writer); holds "bucketed-v1"
    # or "unbucketed-v0" after the first batch's meta resolution.
    _layout: dict[str, str] = {}

    def _legacy_has_buckets(spark: SparkSession) -> bool:
        fs, p = _fs_for(spark, bands_path)
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if st.isDirectory() and name.startswith("__gate_batch="):
                for child in fs.listStatus(st.getPath()):
                    child_name = child.getPath().getName()
                    if child.isDirectory() and child_name.startswith("__bucket="):
                        return True
                return False
        return False

    def _resolve_layout(spark: SparkSession) -> str:
        if "v" in _layout:
            return _layout["v"]
        meta = read_gate_meta(spark, index_path)
        if meta is not None:
            if meta.get("index_arrays") != index_arrays:
                raise ValueError(
                    f"near-dup gate index at {index_path} was written with "
                    f"index_arrays={meta.get('index_arrays')} but this gate "
                    f"was started with index_arrays={index_arrays}; a "
                    "mismatch silently breaks corpus dedup (missing array "
                    "rows / a stale arrays path). Restart with the recorded "
                    "value, or rebuild the index from the store."
                )
            if meta.get("layout") == "bucketed-v1" and meta.get(
                "num_buckets"
            ) != num_buckets:
                raise ValueError(
                    f"near-dup gate index at {index_path} was bucketed with "
                    f"num_buckets={meta.get('num_buckets')} but this gate "
                    f"was started with num_buckets={num_buckets}; the "
                    "modulus is baked into the __bucket directory names, so "
                    "pruned reads would probe the wrong buckets and miss "
                    "near-dups. Restart with the recorded value."
                )
            _layout["v"] = meta["layout"]
        elif not _store_exists(spark, bands_path):
            # fresh store: record the layout contract BEFORE any data
            # write, so every later crash window leaves meta present and
            # meta-less-with-bands can only mean a legacy (pre-meta) store
            write_gate_meta(
                spark,
                index_path,
                {
                    "layout": "bucketed-v1",
                    "num_buckets": num_buckets,
                    "index_arrays": index_arrays,
                },
            )
            _layout["v"] = "bucketed-v1"
        elif _legacy_has_buckets(spark):
            raise RuntimeError(
                f"near-dup gate index at {index_path} has bucketed "
                "__bucket= directories but no _gate_meta.json recording "
                "the bucket count; pruned reads under a guessed modulus "
                "would silently miss near-dups. If the original "
                "num_buckets is known, write "
                f"{index_path.rstrip('/')}/_gate_meta.json = "
                '{"layout": "bucketed-v1", "num_buckets": <original>, '
                f'"index_arrays": {str(index_arrays).lower()}}} and '
                "restart; otherwise rebuild the index from the store."
            )
        else:
            # un-bucketed legacy index (pre-bucketing layout): adopt it —
            # unpruned reads are correct (just slower), and recording the
            # adoption keeps the store permanently consistent instead of
            # mixing bucketed and un-bucketed batch partitions
            if index_arrays and not _store_exists(spark, arrays_path):
                raise RuntimeError(
                    f"near-dup gate index at {index_path} is a legacy "
                    "bands-only (hybrid) index with no shingle-arrays "
                    "path; starting with index_arrays=True would silently "
                    "drop every pre-existing corpus candidate in the "
                    "verify join. Restart with index_arrays=False, or "
                    "rebuild the index from the store with "
                    "build_minhash_index."
                )
            write_gate_meta(
                spark,
                index_path,
                {
                    "layout": "unbucketed-v0",
                    "num_buckets": None,
                    "index_arrays": index_arrays,
                },
            )
            _layout["v"] = "unbucketed-v0"
        return _layout["v"]

    def _write_part(
        df: DataFrame, path: str, batch_id: int, bucket: Column | None = None
    ) -> None:
        # STATIC overwrite of this batch's own partition directory (the
        # Hive-layout path readers discover as __gate_batch=N), not a
        # dynamic-partition-overwrite of the whole store: the commit then
        # never lists or stages the store's other partitions (measured
        # ~2× cheaper per write at a 256-partition index), and a replay
        # wipes the ENTIRE directory of a partial earlier attempt instead
        # of only the sub-partitions the recomputed batch happens to
        # touch. Bucketed paths cluster rows by bucket first so each
        # bucket dir gets ~1 file per batch — without this every shuffle
        # task holding rows for a bucket emits its own file, and the
        # pruned reads this layout exists for drown in file-open overhead.
        target = f"{path.rstrip('/')}/__gate_batch={int(batch_id)}"
        if bucket is not None:
            (
                df.withColumn("__bucket", bucket)
                .repartition(F.col("__bucket"))
                .write.mode("overwrite")
                .partitionBy("__bucket")
                .parquet(target)
            )
        else:
            df.write.mode("overwrite").parquet(target)

    def _gate(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Observation

        spark = batch_df.sparkSession
        batch_df = batch_df.dropDuplicates([id_col])
        slim = batch_df.select(id_col, text_col)
        metrics: list[DataFrame] = [] if on_metrics else None
        # ADVICE r5 (medium): the indexed branch reads bands + ONE other
        # path (arrays in full-index mode, the store in hybrid mode). A
        # crash during the FIRST batch between the store write and the
        # later index writes can leave a subset of the three paths
        # existing; guarding only bands_path would send the replay into
        # the indexed branch and a hard path-does-not-exist read,
        # permanently stalling the stream. Require EVERY path the branch
        # reads to exist; otherwise fall back to the self-contained
        # branch — equivalent for batch 0, since the indexed branch
        # filters to __gate_batch < 0 = nothing anyway, and batch 0 is
        # the only batch that can be missing a path (later batches write
        # every path per batch, and partial partition N is invisible
        # behind the < N filter).
        layout = _resolve_layout(spark)
        bucketed = layout == "bucketed-v1"
        indexed_ready = _store_exists(spark, bands_path) and _store_exists(
            spark, arrays_path if index_arrays else store_path
        )
        keep: list[DataFrame] = []
        try:
            if indexed_ready:
                b_bands, b_arrays = build_minhash_index(slim, id_col, text_col)
                # prune the band-row read to the buckets this batch probes
                # (corpus rows in any other bucket can't equi-join a batch
                # row — bucket list, not keys, bounded by num_buckets),
                # then fetch the candidate PAIRS themselves to the driver
                # through ONE broadcast-join action: the batch band rows
                # broadcast against the pruned index scan, no shuffle, no
                # distinct (duplicates across bands dedupe driver-side).
                # Candidates are small by LSH construction; the
                # limit(cap+1) guards the collect, and an overflow falls
                # back to the fully distributed candidate path (which
                # also applies the bucket-size cap — the lean path
                # verifies EVERY candidate exactly instead of capping,
                # strictly better recall on the batches small enough to
                # take it).
                if bucketed:
                    probe_buckets = [
                        r[0]
                        for r in b_bands.select(_band_bucket().alias("__b"))
                        .distinct()
                        .collect()
                    ]
                    c_bands = (
                        spark.read.parquet(bands_path)
                        .filter(
                            (F.col("__gate_batch") < batch_id)
                            & F.col("__bucket").isin(probe_buckets)
                        )
                        .drop("__gate_batch", "__bucket")
                    )
                else:
                    # adopted legacy layout: no bucket dirs to prune — the
                    # batch filter is the only pruning axis
                    c_bands = (
                        spark.read.parquet(bands_path)
                        .filter(F.col("__gate_batch") < batch_id)
                        .drop("__gate_batch")
                    )
                cand_cap = 100_000
                a_rows = b_bands.select(
                    "band_idx", "band_key", F.col(id_col).alias("id_a")
                )
                all_rows = b_bands.select(
                    "band_idx", "band_key", F.col(id_col).alias("id_b"),
                    F.lit("b").alias("__side_b"),
                ).unionByName(
                    c_bands.select(
                        "band_idx", "band_key", F.col(id_col).alias("id_b"),
                        F.lit("c").alias("__side_b"),
                    )
                )
                lean = (
                    F.broadcast(a_rows)
                    .join(all_rows, ["band_idx", "band_key"])
                    .filter(
                        (F.col("__side_b") == "c")
                        | (
                            (F.col("__side_b") == "b")
                            & (F.col("id_a") < F.col("id_b"))
                        )
                    )
                    .select(
                        "id_a",
                        "id_b",
                        F.when(F.col("__side_b") == "c", F.lit("corpus"))
                        .otherwise(F.lit("batch"))
                        .alias("match_source"),
                        _id_bucket("id_b").alias("__b"),
                    )
                )
                got_rows = lean.limit(cand_cap + 1).collect()
                if len(got_rows) <= cand_cap:
                    seen = {(r[0], r[1], r[2]) for r in got_rows}
                    cand = spark.createDataFrame(
                        sorted(seen),
                        lean.select("id_a", "id_b", "match_source").schema,
                    )
                    # corpus-side id-buckets, free from the collected rows;
                    # [] ⇒ no corpus candidates at all this batch
                    cand_buckets = sorted(
                        {r[3] for r in got_rows if r[2] == "corpus"}
                    )
                    if metrics is not None:
                        # the lean path caps nothing — every candidate is
                        # verified exactly, so the drop metrics are TRUE
                        # literal zeros
                        metrics.append(_oversized_metrics_row(spark, None, None))
                else:
                    # overflow: the distributed path with the bucket-size
                    # cap (and its real drop metrics)
                    cand = incremental_candidate_pairs(
                        b_bands, c_bands, id_col, metrics_out=metrics, spark=spark
                    ).persist()
                    keep.append(cand)
                    if index_arrays and bucketed:
                        cand_buckets = [
                            r[0]
                            for r in cand.filter(F.col("match_source") == "corpus")
                            .select(_id_bucket("id_b").alias("__b"))
                            .distinct()
                            .collect()
                        ]
                    else:
                        # the bucket list is only consumed by the bucketed
                        # arrays pruning below — skip the extra distributed
                        # action entirely in hybrid / legacy modes
                        # (ADVICE r6 low #2); None ⇒ unknown, read unpruned
                        cand_buckets = None
                if index_arrays:
                    # verify needs corpus shingles ONLY for candidate ids:
                    # prune the arrays read to the candidates' id-buckets
                    if cand_buckets == []:
                        c_arrays = b_arrays.limit(0)
                    elif bucketed and cand_buckets is not None:
                        c_arrays = (
                            spark.read.parquet(arrays_path)
                            .filter(
                                (F.col("__gate_batch") < batch_id)
                                & F.col("__bucket").isin(cand_buckets)
                            )
                            .drop("__gate_batch", "__bucket")
                        )
                    else:
                        c_arrays = (
                            spark.read.parquet(arrays_path)
                            .filter(F.col("__gate_batch") < batch_id)
                            .drop("__gate_batch")
                        )
                else:
                    # hybrid: verify shingles re-derived from store TEXT
                    c_arrays = with_shingle_array(
                        spark.read.parquet(store_path)
                        .filter(F.col("__gate_batch") < batch_id)
                        .select(id_col, text_col),
                        id_col,
                        text_col,
                        out="__shingles",
                    )
                pairs = verify_candidate_pairs(
                    b_arrays.unionByName(c_arrays), cand, id_col, threshold
                )
                drop_ids = (
                    pairs.filter(F.col("match_source") == "corpus")
                    .select(F.col("id_a").alias(id_col))
                    .unionByName(
                        pairs.filter(F.col("match_source") == "batch")
                        .select(F.col("id_b").alias(id_col))
                    )
                    .distinct()
                )
            else:
                pairs = minhash_near_dups(
                    slim, id_col, text_col, threshold=threshold,
                    metrics_out=metrics,
                )
                drop_ids = pairs.select(F.col("id_b").alias(id_col)).distinct()
            survivors = batch_df.join(drop_ids, id_col, "left_anti")
            obs = None
            if on_metrics:
                obs = Observation(f"neardup_gate_idx_{batch_id}")
                mrow = metrics[0].observe(
                    obs,
                    F.max("oversized_buckets").alias("oversized_buckets"),
                    F.max("oversized_rows").alias("oversized_rows"),
                )
                survivors = survivors.crossJoin(F.broadcast(mrow)).drop(
                    "oversized_buckets", "oversized_rows"
                )
            # micro-batch-sized: persist (post-observe, so the metrics
            # ride the one materializing action) so the three partition
            # writes don't each re-run the verify join and its pruned
            # index reads
            survivors = survivors.persist()
            keep.append(survivors)
            # dynamic overwrite writes nothing for an empty batch —
            # partition N simply never exists, which reads the same as
            # empty. Write order: store first, index paths after, bands
            # LAST — bands is the branch trigger above, so a first-batch
            # crash mid-sequence leaves either no bands (→ clean fallback
            # branch on replay) or a complete path set.
            s_bands, s_arrays = build_minhash_index(
                survivors.select(id_col, text_col), id_col, text_col
            )
            _write_part(survivors, store_path, batch_id)
            if index_arrays:
                _write_part(
                    s_arrays,
                    arrays_path,
                    batch_id,
                    _id_bucket(id_col) if bucketed else None,
                )
            _write_part(
                s_bands,
                bands_path,
                batch_id,
                _band_bucket() if bucketed else None,
            )
            if obs is not None:
                # folded ride-along (zero survivors): getRowOrEmpty probe →
                # direct evaluation — cheap here, the metrics lineage reads
                # the index, not the corpus; real failures propagate
                got = observed_or_direct(obs, metrics[0])
                on_metrics(
                    batch_id,
                    {
                        "oversized_buckets": got.get("oversized_buckets") or 0,
                        "oversized_rows": got.get("oversized_rows") or 0,
                    },
                )
            if compact_every:
                # in-line maintenance: fold live batch partitions into the
                # -1 base once enough accumulate. Runs strictly between
                # this batch's writes and the next batch's reads — the
                # gate is the only writer, so the no-concurrent-batch
                # precondition of compact_gate_store holds; a replay of
                # THIS batch after a post-compaction crash converges
                # (its docs exact-match their folded copies in the base
                # and partition N overwrites to empty). Crash
                # mid-compaction heals via the staged snapshot's manifest
                # on the next trigger.
                fs, store_p = _fs_for(spark, store_path)
                live = [
                    st.getPath().getName()
                    for st in fs.listStatus(store_p)
                    if st.isDirectory()
                    and st.getPath().getName().startswith("__gate_batch=")
                    and st.getPath().getName() != "__gate_batch=-1"
                ]
                if len(live) >= compact_every:
                    compact_gate_store(
                        spark, store_path, target_files=compact_target_files
                    )
                    if index_arrays:
                        compact_gate_store(spark, arrays_path)
                    compact_gate_store(spark, bands_path)
        finally:
            for df_ in keep:
                df_.unpersist()

    writer = stream.writeStream.foreachBatch(_gate).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_gate_store(
    spark: SparkSession, path: str, target_files: int = 1
) -> int:
    """Offline maintenance for the gate's batch-partitioned stores
    (the survivors store and each index path of
    ``start_neardup_gate_sink_indexed``): fold every ``__gate_batch=N``
    partition into ONE base generation at ``__gate_batch=-1``, with one
    file per bucket (bucketed index paths keep their ``__bucket``
    sub-partitions; the flat store compacts to a single file set). The
    gate only ever reads ``__gate_batch < N`` with N ≥ 0, so the ``-1``
    base stays visible to every future batch — the read contract is
    unchanged, and the long-running stream's file count resets from
    O(batches × buckets) to O(buckets). Returns the number of batch
    partitions folded.

    Crash-safe by the sketch sink's staged-swap discipline: the compacted
    generation is written to a ``.__compact_staging`` sibling first
    (outside the store, so readers never see a mixed layout), together
    with a MANIFEST of exactly the batch directories it snapshots, then
    those directories are deleted and the staging directory renamed to
    ``__gate_batch=-1``. Every crash point resolves on the next call: a
    staging dir bearing both ``_SUCCESS`` and the manifest is adopted —
    the deletes are SCOPED TO THE MANIFEST (ADVICE r6: batches written
    between a crashed compaction and the retry — e.g. by a restarted
    stream — are NOT covered by the snapshot and must survive; they stay
    in place as live partitions beside the promoted base, which is
    exactly the store's normal mixed state). A staging dir missing
    either marker is an incomplete remnant: discarded and rebuilt.
    Safe to run whenever no batch is concurrently WRITING — i.e. with
    the stream stopped, or from inside the gate's own foreachBatch
    (``compact_every``), which is the only writer.

    ``target_files`` sizes the FLAT store's folded base: 1 (default)
    coalesces to one task's output — right for test-scale stores;
    > 1 repartitions to exactly that many parts (the directory-shaped
    base a 100 TB store needs — no single task could rewrite it), at
    the cost of one round-robin shuffle of bytes the fold was rewriting
    anyway. Bucketed index paths ignore it (their layout is the bucket
    sub-partitioning)."""
    import json

    staging = path.rstrip("/") + ".__compact_staging"
    manifest_path = staging + "/_COMPACT_MANIFEST.json"
    def _p(s: str):
        return jvmseam.hadoop_path(spark, s)

    fs, _ = jvmseam.hadoop_fs(spark, path)

    def _batch_dirs() -> list[str]:
        if not fs.exists(_p(path)):
            return []
        out = []
        for st in fs.listStatus(_p(path)):
            name = st.getPath().getName()
            if st.isDirectory() and name.startswith("__gate_batch="):
                out.append(name)
        return out

    def _swap(dirs: list[str]) -> None:
        for d in dirs:
            tgt = _p(f"{path.rstrip('/')}/{d}")
            if fs.exists(tgt) and not fs.delete(tgt, True):
                raise RuntimeError(f"compact_gate_store: failed to drop {tgt}")
        # the manifest must not be promoted into the live partition —
        # parquet readers ignore _-prefixed files, but leaving it there
        # would let a LATER adoption misread a stale snapshot scope
        if fs.exists(_p(manifest_path)):
            fs.delete(_p(manifest_path), False)
        if not fs.rename(_p(staging), _p(f"{path.rstrip('/')}/__gate_batch=-1")):
            raise RuntimeError(
                f"compact_gate_store: failed to promote {staging}"
            )

    # recovery: adopt a fully-committed staging generation left by a
    # crashed earlier call, deleting ONLY the batch dirs its manifest
    # records — any dir not in the manifest was written after the
    # snapshot and keeps its data by staying live
    if fs.exists(_p(staging + "/_SUCCESS")) and fs.exists(_p(manifest_path)):
        raw = _read_small_file(spark, manifest_path)
        _swap(json.loads(raw)["dirs"])
        return 0
    if fs.exists(_p(staging)):
        fs.delete(_p(staging), True)  # incomplete remnant

    dirs = _batch_dirs()
    if not dirs:
        return 0
    df = spark.read.parquet(path)
    bucketed = "__bucket" in df.columns
    if bucketed:
        (
            df.drop("__gate_batch")
            .repartition(F.col("__bucket"))
            .write.mode("overwrite")
            .partitionBy("__bucket")
            .parquet(staging)
        )
    elif target_files > 1:
        # directory-shaped base (the 100 TB layout): a deterministic
        # round-robin repartition — one extra shuffle of the store bytes,
        # but the fold is a full rewrite anyway, and coalesce() can only
        # REDUCE partitions (a small-file store reads as few partitions,
        # so coalesce(32) would silently emit a near-single-file base)
        df.drop("__gate_batch").repartition(target_files).write.mode(
            "overwrite"
        ).parquet(staging)
    else:
        # flat survivors store, test-scale default: one task's output
        df.drop("__gate_batch").coalesce(1).write.mode("overwrite").parquet(
            staging
        )
    # commit marker pair: _SUCCESS (parquet committer) + the manifest —
    # written AFTER the data, so a crash in between reads as incomplete
    _write_small_file(spark, manifest_path, json.dumps({"dirs": dirs}))
    _swap(dirs)
    return len(dirs)


def start_cardinality_sink(
    stream: DataFrame,
    store_path: str,
    checkpoint_path: str,
    key_col: str = "author",
    ts_col: str = "created_at",
    available_now: bool = False,
) -> StreamingQuery:
    """Streaming distinct-count sketches: each micro-batch's keys fold
    into ONE per-day HLL sketch row (``hll_sketch_agg``), merged with the
    stored sketch via ``hll_union`` — the streaming form of
    ``profiling.build_cardinality_sketches``. The store holds a few KB
    per day REGARDLESS of key cardinality, and never the raw keys: this
    is how a 100 TB ingest answers "distinct authors per day / this
    month" without ever reshuffling history ("how many total" is one
    ``hll_union_agg`` over the day rows). Exactly-once convergence has a
    different source than the merge sink's keyed upsert: HLL union is
    IDEMPOTENT (folding the same keys twice is a no-op), so a replayed
    batch leaves every estimate unchanged. The store deliberately holds
    ONLY idempotent state — an earlier draft also kept a summed row
    counter, but foreachBatch is at-least-once and a replayed batch
    would inflate any additive column; a counter belongs in the keyed
    merge sink, where re-delivered keys upsert instead of adding. Rows
    with a NULL timestamp fold into an '__unknown__' day row rather
    than a NULL key (a NULL day would match neither isin(touched) nor
    its negation below and silently vanish on the next merge).

    The store rewrite is a staged swap, not ``mode("overwrite")`` on the
    live path (ADVICE r4: overwrite is delete-then-write — a crash
    between the two permanently loses every prior day's sketch, and the
    checkpoint will NOT replay old batches to rebuild them). Each fold
    writes the next generation to a ``__staging`` sibling, then
    delete-old + rename-staging — and the only crash window that leaves
    the live path missing (between delete and rename) leaves a FULLY
    COMMITTED staging generation behind, which the next fold's recovery
    step renames into place before touching anything (completeness
    attested by the parquet committer's _SUCCESS marker). Every crash
    point therefore resolves to a complete store + an at-least-once
    batch replay, which HLL-union idempotence absorbs. Staging also
    removes the old read-while-overwriting-self hazard, so the fold
    writes the plan directly instead of collecting rows through the
    driver.
    """
    staging_path = store_path.rstrip("/") + "__staging"

    def _swap_in(spark: SparkSession) -> None:
        fs, final_p = jvmseam.hadoop_fs(spark, store_path)
        stage_p = jvmseam.hadoop_path(spark, staging_path)
        if fs.exists(final_p) and not fs.delete(final_p, True):
            raise RuntimeError(f"cardinality sink: failed to drop old {store_path}")
        if not fs.rename(stage_p, final_p):
            raise RuntimeError(
                f"cardinality sink: failed to promote {staging_path} -> {store_path}"
            )

    def _staging_committed(spark: SparkSession) -> bool:
        fs, marker = jvmseam.hadoop_fs(spark, staging_path + "/_SUCCESS")
        return bool(fs.exists(marker))

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if not _store_exists(spark, store_path) and _staging_committed(spark):
            # crashed between delete-old and rename: the staging
            # generation IS the newest complete store — finish the swap
            _swap_in(spark)
        day_sketches = batch_df.groupBy(
            F.coalesce(
                F.date_format(ts_col, "yyyy-MM-dd"), F.lit("__unknown__")
            ).alias("day")
        ).agg(F.hll_sketch_agg(key_col).alias("hll_sketch"))
        if _store_exists(spark, store_path):
            existing = spark.read.parquet(store_path)
            touched = [r["day"] for r in day_sketches.select("day").distinct().collect()]
            hit = existing.filter(F.col("day").isin(touched))
            untouched = existing.filter(~F.col("day").isin(touched))
            merged_hit = (
                hit.select("day", "hll_sketch")
                .unionByName(day_sketches)
                .groupBy("day")
                .agg(F.expr("hll_union_agg(hll_sketch)").alias("hll_sketch"))
            )
            out = untouched.unionByName(merged_hit)
        else:
            out = day_sketches
        # stage the next generation (reads the live store, writes the
        # sibling — no self-overwrite), then swap it into place
        out.coalesce(1).write.mode("overwrite").parquet(staging_path)
        _swap_in(spark)

    writer = stream.writeStream.foreachBatch(_fold).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_drift_monitor_sink(
    stream: DataFrame,
    reference: DataFrame,
    store_path: str,
    checkpoint_path: str,
    bucket_col: str,
    available_now: bool = False,
) -> StreamingQuery:
    """Streaming distribution-drift monitor: every micro-batch's
    ``bucket_col`` distribution is scored against a STATIC reference
    distribution with the PSI metric (``profiling.distribution_drift_psi``
    — Laplace-smoothed over the bucket union, integer micro output) and
    the per-batch result row is APPENDED to a drift log. This is the
    alerting loop of the batch drift_psi query: the reference is the
    blessed corpus snapshot (broadcast-sized after its one-time
    aggregation), each batch costs one bounded bucket aggregate + the
    tiny PSI join, and the log is what a pager threshold reads
    (> 250000 micro = the classic 0.25 action level). Append-only with
    batch_id in the row: a replayed batch writes a duplicate log row
    rather than corrupting state — drift rows are observations, not
    state, so dedup-on-read by (batch_id) is the consumer's contract."""
    from mbgspark.operators.profiling import distribution_drift_psi

    # aggregate + persist the reference distribution ONCE — every batch
    # scores against the bounded (bucket, c1) frame, never re-scanning
    # the blessed snapshot (review r4)
    ref_counts = (
        reference.select(F.col(bucket_col).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("c1"))
        .persist()
    )
    ref_counts.count()

    def _score(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        cur = batch_df.select(F.col(bucket_col).alias("b"))
        row = distribution_drift_psi(
            ref_counts, cur, "b", old_pre_counted=True
        ).select(
            F.lit(batch_id).cast("bigint").alias("batch_id"),
            "n_buckets",
            "psi_micro",
        )
        row.write.mode("append").parquet(store_path)

    writer = stream.writeStream.foreachBatch(_score).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
