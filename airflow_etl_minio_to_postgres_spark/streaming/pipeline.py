"""Structured Streaming over the events table — windowed aggregation with
watermarks and a custom stateful operator.

The reference is strictly batch (``@daily`` schedule,
``dags/dag_etl_minio_to_postgres.py:248``); this module is the extension
surface SURVEY.md §7/M5 describes: the same declarative aggregations,
incrementally maintained by micro-batches.

Design notes for scale:

* File-source streams + ``availableNow`` give exactly-once incremental
  backfill over a growing directory — the pattern for continuously-landing
  training data.  State is bounded by the watermark: late events beyond the
  horizon are dropped instead of growing state forever.
* ``applyInPandasWithState`` holds one small state blob per group key —
  the distributed, fault-tolerant replacement for the reference's global
  mutable ``id_mapping`` dict (``:28``), which only worked single-process.
* Sinks here are the in-memory table (tests) — production swaps in
  ``foreachBatch`` -> parquet/JDBC upsert without touching the plan.
"""

from __future__ import annotations

import itertools
import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from airflow_etl_minio_to_postgres_spark.sources.catalog import (
    nanos_ts_columns,
    raw_read_schema,
    restore_nanos_timestamps,
)

_sink_counter = itertools.count()

# One state partition per this many bytes of backlog awaiting ingest at a
# stateful stream's source.  State-store instances have a fixed per-
# partition setup/commit cost with NO data component (measured: a fresh
# stream-stream join spends ~0.25 s per state partition of pure no-CPU
# provider init — 32 partitions x 4 join stores cost ~8 s wall on a 2 MB
# backlog), so the partition count should follow the data, not the core
# count.  64 MB keeps state partitions in the guide's reduce-partition
# size band; the session's configured shuffle parallelism stays the cap.
_STATE_BYTES_PER_PARTITION = 64 * 1024 * 1024


class scaled_state_partitions:
    """Context manager sizing ``spark.sql.shuffle.partitions`` — which
    pins a FRESH stateful stream's state-partition count for the life of
    its checkpoint — to the bytes actually awaiting ingest at the
    stream's source paths, capped at the session's configured value.

    Scale-adaptive, not local-tuned: a 100 TB backlog keeps the
    session's full parallelism, a megabyte-scale backfill stops paying
    per-partition state-store setup for empty partitions.  Partition
    count never changes WHAT a stateful query emits — aggregation and
    join results are partitioning-independent — it only changes task
    grain.  Only meaningful around the FIRST run of a checkpoint
    (Structured Streaming re-reads the count from the checkpoint on
    restart, as always).

    CONCURRENCY CONTRACT (shared with graph._loop_shuffle_partitions):
    ``spark.sql.shuffle.partitions`` is SESSION-GLOBAL state — this
    scope is safe for the serial caller (the bench/driver shape), and
    for NESTED scopes on one thread (each inner scope caps at and
    restores the enclosing scope's value; exceptions restore too —
    both pytest-pinned).  Concurrent queries on the SAME SparkSession
    from other driver threads would observe the scaled value while the
    scope is open; run concurrent work from ``spark.newSession()``
    clones (separate per-session conf over one SparkContext) if that
    matters."""

    def __init__(self, spark: SparkSession, *source_paths: str):
        self._spark = spark
        self._paths = source_paths
        self._prev: str | None = None

    def _backlog_bytes(self) -> int:
        jvm = self._spark.sparkContext._jvm
        hconf = self._spark.sparkContext._jsc.hadoopConfiguration()
        total = 0
        for p in self._paths:
            hpath = jvm.org.apache.hadoop.fs.Path(p)
            fs = hpath.getFileSystem(hconf)
            if fs.exists(hpath):
                total += int(fs.getContentSummary(hpath).getLength())
        return total

    def __enter__(self):
        if not self._paths:  # no listable backlog: keep session sizing
            return self
        self._prev = self._spark.conf.get("spark.sql.shuffle.partitions")
        n = max(1, -(-self._backlog_bytes() // _STATE_BYTES_PER_PARTITION))
        n = min(n, int(self._prev))
        self._spark.conf.set("spark.sql.shuffle.partitions", str(n))
        return self

    def __exit__(self, *exc):
        if self._prev is not None:
            self._spark.conf.set(
                "spark.sql.shuffle.partitions", self._prev
            )
        return False


def _fs_exists(spark: SparkSession, path: str) -> bool:
    """Existence probe on the filesystem SPARK writes to (Hadoop
    FileSystem API), never the driver's local one: ``os.path.exists``
    on a URI path (``s3a://``, even ``file://``) returns False forever,
    and a broad read-and-catch treats ANY ``AnalysisException`` (schema
    corruption, momentarily unreadable dir, misconfigured path) as
    "absent" — the silent-skip failure mode a dedup screen must not
    have (round-10 advisor finding).  This asks the exact question:
    does the path exist on the session's filesystem for that scheme."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def _commit_token(checkpoint_path: str) -> str:
    """Deterministic short token identifying a checkpoint lineage.

    Micro-batch ids are only unique WITHIN one checkpoint: a stream
    restarted against a fresh checkpoint restarts at batch 0, so an
    idempotence key of bare ``batch_id`` would collide with (and
    silently clobber or skip) work done under a previous checkpoint.
    Keying every commit on ``(checkpoint token, batch_id)`` makes
    replay detection exact per lineage.  Deleting a checkpoint while
    keeping its outputs remains undefined behavior, as in any
    Structured Streaming pipeline — the token is derived from the
    checkpoint PATH, so a recreated checkpoint at the same path reuses
    ids."""
    import zlib

    return format(zlib.crc32(checkpoint_path.encode("utf-8")), "08x")


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet directory (schema
    declared — a streaming scan must never infer).  The timestamp
    physical type is footer-sniffed like the batch path, so a nanos or
    micros regeneration of the driver data is equally safe."""
    nanos = nanos_ts_columns(os.path.join(sf_dir, "events.parquet"), "events")
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The file stream source wants a directory; select the events object
    # with a glob filter so the same sf_dir layout works batch and stream.
    raw = (
        spark.readStream.schema(raw_read_schema("events", nanos))
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return restore_nanos_timestamps(raw, nanos)


def stream_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the embeddings parquet (schema declared —
    a streaming scan must never infer).  The vector-ingest face of
    :func:`stream_events`: feeds :func:`streaming_ivf_index_upsert` in
    the registry entry so the continuously-maintained ANN index is
    oracle-gated end to end."""
    raw = (
        spark.readStream.schema(raw_read_schema("embeddings"))
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf_dir)
    )
    return raw


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents parquet (schema declared —
    a streaming scan must never infer).  The text-ingest face of
    :func:`stream_events`: feeds :func:`streaming_inverted_index_upsert`
    so the continuously-maintained BM25 index is oracle-gated end to
    end."""
    return (
        spark.readStream.schema(raw_read_schema("documents"))
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def hourly_agg_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window aggregation: (hour, event_type) ->
    count + sum(value).  The watermark bounds state; output schema is
    flattened so batch and stream results are directly comparable.

    The value sum is carried through state as EXACT bigint micro-units
    (2-dp data) and converted once on emission: double accumulation in
    streaming state is micro-batch-arrival-order dependent, so the
    emitted sum would otherwise wobble between a backfill and a live
    run of the same data — the streaming face of the stable_sum
    policy."""
    micros = F.round(F.col("value") * F.lit(1e6)).cast("long")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(micros).alias("_sv_micros"),
        )
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "n_events",
            (F.col("_sv_micros").cast("double") / F.lit(1e6)).alias(
                "sum_value"
            ),
        )
    )


def run_available_now(
    sdf: DataFrame,
    output_mode: str = "complete",
    source_paths: tuple[str, ...] = (),
) -> DataFrame:
    """Run a streaming frame to completion over all currently-available
    input (micro-batch backfill) and return the materialized result.

    ``source_paths`` (the stream's input files/dirs, when the caller
    knows them) sizes the fresh checkpoint's state-partition count to
    the actual backlog via :class:`scaled_state_partitions` — omit it
    for sources without a listable backlog and the session's configured
    parallelism applies unchanged."""
    name = f"stream_result_{next(_sink_counter)}"
    spark = sdf.sparkSession
    with scaled_state_partitions(spark, *source_paths):
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def stream_static_enrichment(
    events: DataFrame,
    dim: DataFrame,
    stream_key: str,
    dim_key: str,
    segment_col: str,
) -> DataFrame:
    """Stream-static enrichment: join each micro-batch of the event
    stream against a BATCH dimension table, then aggregate per
    (segment, event_type).  The production lookup-table shape — enrich
    clicks with the account's segment as they arrive.

    Scale shape: the static side is broadcast (dimension-sized), so no
    stream-side shuffle for the join; Spark re-plans the static side
    per micro-batch, which is what makes slowly-changing dimension
    refreshes pick up automatically on the next trigger.  The aggregate
    runs in complete mode with state bounded by the GROUP-BY domain
    (segments x event types — metadata-sized), not by the stream; a
    time-windowed variant would add a watermark instead.  LEFT join:
    an event with no dimension row degrades to segment='unknown',
    never drops (same dirty-data policy as try_cast/try_divide
    elsewhere).  sum(value) goes through exact integer micro-units so
    the emitted double is independent of micro-batch arrival order.
    """
    joined = events.join(
        F.broadcast(dim),
        events[stream_key] == dim[dim_key],
        "left",
    )
    return (
        joined.groupBy(
            F.coalesce(F.col(segment_col), F.lit("unknown")).alias("segment"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.round(F.col("value") * F.lit(1e6)).cast("long")
            ).alias("_sv_micros"),
        )
        .select(
            "segment",
            "event_type",
            "n_events",
            (F.col("_sv_micros").cast("double") / F.lit(1e6)).alias(
                "sum_value"
            ),
        )
    )


STATE_SCHEMA = T.StructType([T.StructField("n", T.LongType())])
USER_COUNT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _count_events(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Stateful per-user running count (custom streaming operator shape:
    per-key state blob updated per micro-batch, cumulative emission)."""
    n = state.get[0] if state.exists else 0
    for pdf in batches:
        n += len(pdf)
    state.update((n,))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})


def stateful_user_counts(events: DataFrame) -> DataFrame:
    """``applyInPandasWithState`` running event count per user — emits the
    cumulative count each micro-batch; the latest emission per user is the
    final count."""
    return events.groupBy("user_id").applyInPandasWithState(
        _count_events,
        outputStructType=USER_COUNT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup(events: DataFrame, subset: list[str]) -> DataFrame:
    """Streaming exact deduplication: emit the first occurrence of each
    distinct ``subset`` key — the streaming counterpart of the batch
    ``dropDuplicates`` dedup kernel (T11), and the shape a continuously-
    landing training-data feed needs (dedup-on-arrival instead of periodic
    batch sweeps).

    This demo keeps ALL keys in state so the emitted set equals the batch
    ``SELECT DISTINCT`` exactly (the oracle contract).  Production bounds
    state with ``withWatermark(ts, h) .dropDuplicatesWithinWatermark``,
    trading exactness across >h-apart duplicates for bounded state — with
    a monotone source the results coincide.
    """
    return events.select(*subset).dropDuplicates(subset)


def stream_stream_attribution(
    events: DataFrame,
    attribution_window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked stream-stream interval self-join: every purchase joined
    to the same user's clicks in the preceding ``attribution_window`` —
    the real-time counterpart of the batch range join
    (operators/temporal.py ``range_join`` / `events_attribution_windows`).

    Scale/state shape: both sides carry a watermark and the join condition
    bounds event-time distance, so Spark derives a state-eviction horizon
    for BOTH join buffers — without the time bound a stream-stream join
    buffers forever.  Inner interval joins emit eagerly (the watermark
    only evicts state, it never delays inner-join output), so an
    ``availableNow`` backfill yields exactly the batch join's pairs.
    Per-side projection happens BEFORE the join so only three narrow
    columns enter the state store, not the wide props JSON.

    ORDERING ASSUMPTION for batch-equality: a row arriving more than
    ``watermark`` behind the stream's max event time has its match state
    already evicted, so its inner-join pairs are silently dropped
    relative to the batch oracle.  Equality therefore requires the
    source's event-time disorder to stay within ``watermark`` — true for
    a single availableNow file batch (everything arrives "at once",
    before any watermark advances) and for landing files written in
    rough time order; for an out-of-order production feed, size
    ``watermark`` from the feed's measured max disorder plus the
    attribution window.
    """
    clicks = (
        events.where(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {attribution_window}")
        ),
        "inner",
    ).select("user_id", "purchase_id", "click_id")


def incremental_silver(
    raw_stream: DataFrame, out_path: str, checkpoint_path: str
):
    """Incremental medallion silver: each micro-batch of raw rows runs the
    batch cleaning kernel (standardize + trim/lower + nullif + typed fill)
    and appends to the silver parquet — the streaming counterpart of the
    reference's daily re-run (``dags/dag_etl_minio_to_postgres.py:248``).

    ``foreachBatch`` reuses the exact batch plan, so stream and batch silver
    are byte-identical for the same input.

    Replay safety: the checkpoint makes restarts exactly-once at the
    batch level, but a crash BETWEEN the parquet append and the
    checkpoint commit replays the batch — with a bare append that
    duplicated its rows.  The sink instead writes each batch into its
    own ``_commit_id`` partition with dynamic partition overwrite: a
    replayed batch REWRITES exactly its own partition (same checkpoint
    lineage + batch id → same commit id), so the table converges to the
    exactly-once result regardless of where the crash landed.  The
    ``_commit_id`` column doubles as per-batch lineage on read; select
    the data columns to ignore it.  Returns the started StreamingQuery.
    """
    token = _commit_token(checkpoint_path)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        _silver_process_batch(batch_df, batch_id, out_path, token)

    return (
        raw_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def _assert_not_legacy_silver(spark: SparkSession, out_path: str) -> None:
    """Loud guard against resuming a ``_commit_id``-partitioned silver
    stream over a pre-round-11 FLAT silver table (plain appended
    part-files at the root): a partitioned write next to flat files
    leaves the directory with conflicting structures — unreadable as
    one table — and silently adds a ``_commit_id`` column for
    downstream readers.  Same posture as the near-dup store's legacy
    check: fail with the migration pointer, never improvise.  One
    ``listStatus`` RPC on the session's filesystem (URI-correct, the
    ``_fs_exists`` precedent) — negligible per-batch cost."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(out_path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return
    for status in fs.listStatus(hpath):
        name = status.getPath().getName()
        if status.isFile() and name.startswith("part-"):
            raise ValueError(
                f"silver table at {out_path!r} has flat data files at "
                "its root (pre-round-11 appended layout) but this sink "
                "writes _commit_id partitions; run migrate_legacy_silver "
                "before resuming the stream"
            )


def _silver_process_batch(
    batch_df: DataFrame, batch_id: int, out_path: str, token: str
) -> None:
    """One :func:`incremental_silver` micro-batch — module-level so the
    replay contract (same batch twice == once) is directly testable."""
    from airflow_etl_minio_to_postgres_spark.plans.medallion import build_silver

    _assert_not_legacy_silver(batch_df.sparkSession, out_path)
    (
        build_silver(batch_df)
        .withColumn("_commit_id", F.lit(f"{token}-{batch_id}"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_commit_id")
        .parquet(out_path)
    )


def migrate_legacy_silver(spark: SparkSession, out_path: str) -> int:
    """One-shot migration of a pre-round-11 FLAT silver table (plain
    appended part-files) to the ``_commit_id``-partitioned replay-safe
    layout that :func:`incremental_silver` writes — the rewrite
    :func:`_assert_not_legacy_silver`'s error message points at,
    mirroring :func:`migrate_legacy_rollup` /
    :func:`migrate_legacy_near_dup_store`.  Pre-migration rows carry
    commit id ``legacy-0`` (their batch lineage is unknowable).
    Idempotent: an already-partitioned table is left untouched.
    Local-FS only (the swap uses ``os.replace``), like the other two
    migrations.  Returns the number of rows migrated (0 when already
    migrated)."""
    from airflow_etl_minio_to_postgres_spark.sources.files import (
        _local_path,
    )

    out_path = _local_path(out_path)
    df = spark.read.parquet(out_path)
    if "_commit_id" in df.columns:
        return 0
    migrated = df.withColumn("_commit_id", F.lit("legacy-0"))
    import shutil

    tmp = out_path.rstrip("/") + "__migrate_tmp"
    old = out_path.rstrip("/") + "__migrate_old"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        migrated.write.mode("overwrite")
        .partitionBy("_commit_id")
        .parquet(tmp)
    )
    shutil.rmtree(old, ignore_errors=True)
    os.replace(out_path, old)
    os.replace(tmp, out_path)
    shutil.rmtree(old, ignore_errors=True)
    return spark.read.parquet(out_path).count()


def streaming_rollup_upsert(
    raw_stream: DataFrame, out_path: str, checkpoint_path: str
):
    """Continuous-aggregate maintenance (the hypertable rollup pattern):
    each micro-batch aggregates to (hour, event_type) PARTIALS, then
    merge-sums them into the materialized rollup parquet — so the serving
    table is always a complete hourly aggregate of everything ingested,
    without ever re-scanning history.

    The merge re-aggregates existing + partial on the rollup key: count
    and sum are decomposable, so merged state is exactly the batch
    aggregate over all arrived data.  The read-merge-rewrite is
    dimension-scale work (the ROLLUP is small even when the stream is
    not — that is the point of a rollup).

    Replay safety: a merge is NOT idempotent (re-merging a batch's
    partials double-counts), so the sink records the last-merged
    ``(checkpoint token, batch_id)`` in a ``_last_batch`` marker file
    written INSIDE the staged directory and promoted by the same
    ``os.replace`` as the merged table — marker and data commit
    atomically together.  A batch whose id is already covered by the
    marker (crash landed between the rewrite and the checkpoint
    commit) is a no-op on replay.  A legacy table without a marker
    merges normally and gains one.  Returns the started StreamingQuery.
    """
    from airflow_etl_minio_to_postgres_spark.sources.files import (
        _local_path,
        _rewrite_in_place,
    )

    # Normalize ONCE, before the first batch: the existence check below
    # is os.path-based, so a file:// URI would read as absent, the merge
    # would be skipped, and the rewrite would REPLACE the rollup with
    # just this batch's partials — silent data loss.  _local_path
    # resolves file:// and refuses object-store URIs loudly (this sink
    # is local-FS-only by construction: the rewrite swaps directories
    # with os.replace).
    out_path = _local_path(out_path)
    token = _commit_token(checkpoint_path)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        _rollup_process_batch(batch_df, batch_id, out_path, token)

    return (
        raw_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def _rollup_process_batch(
    batch_df: DataFrame, batch_id: int, out_path: str, token: str
) -> None:
    """One :func:`streaming_rollup_upsert` micro-batch — module-level so
    the replay contract (an already-merged batch is a no-op) is directly
    testable.  ``out_path`` must already be local-FS-normalized."""
    from airflow_etl_minio_to_postgres_spark.sources.files import (
        _rewrite_in_place,
    )

    spark = batch_df.sparkSession
    marker = os.path.join(out_path, "_last_batch")
    if os.path.exists(marker):
        with open(marker, encoding="utf-8") as f:
            last_token, _, last_id = f.read().strip().partition(":")
        if last_token == token and batch_id <= int(last_id):
            return  # crash-replayed batch: already merged, no-op
    # The materialized rollup stores the value sum as EXACT bigint
    # micro-units: merge-summing double partials across restarts and
    # micro-batch splits would accumulate order-dependent float
    # error in the serving table itself; integer partials merge
    # associatively forever.  Readers convert on the way out.
    partial = batch_df.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            F.round(F.col("value") * F.lit(1e6)).cast("long")
        ).alias("sum_value_micros"),
    )
    if os.path.exists(out_path):
        # Guard the storage contract BEFORE merging: reading with
        # ``schema(partial.schema)`` would silently surface NULL for
        # any renamed/missing on-disk column (e.g. a legacy table
        # written with double ``sum_value`` before the micro-unit
        # migration), corrupting merged totals forever.  Fail loudly
        # instead; migration of legacy tables is a deliberate
        # one-time rewrite, not something a sink should improvise
        # mid-stream (round-8 advisor finding).
        on_disk = {
            f.name: f.dataType for f in spark.read.parquet(out_path).schema
        }
        expected = {f.name: f.dataType for f in partial.schema}
        if on_disk != expected:
            raise ValueError(
                f"rollup at {out_path!r} has schema {sorted(on_disk)} "
                f"but this writer stores {sorted(expected)} (exact "
                "bigint micro-units since round 8); migrate the legacy "
                "table explicitly before resuming the stream"
            )
        existing = spark.read.schema(partial.schema).parquet(out_path)
        merged = (
            existing.unionByName(partial)
            .groupBy("hour", "event_type")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value_micros").alias("sum_value_micros"),
            )
        )
    else:
        merged = partial
    _rewrite_in_place(
        merged, out_path,
        extra_files={"_last_batch": f"{token}:{batch_id}"},
    )


def streaming_near_dup_dedup(
    raw_stream: DataFrame,
    out_path: str,
    store_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 8,
    num_bands: int = 4,
    shingle_k: int = 3,
    store_partitions: int = 64,
    max_bucket_size: int | None = None,
):
    """Cross-batch NEAR-duplicate dedup — accept-on-first-sight MinHash
    LSH over a continuously ingested corpus: each micro-batch drops
    documents that near-duplicate an already-ACCEPTED document (from
    the persistent signature store) or a smaller-id document in the
    same batch, writes the survivors' rows to ``out_path`` and their
    signatures to the store.  The streaming member of the dedup family:
    ``streaming_dedup`` is its exact-key sibling; this one catches the
    boilerplate-shifted and lightly-edited copies exact keys miss.

    Policies, chosen to match the batch operators so the composition is
    oracle-checkable: intra-batch uses near_dup_pairs' pairwise greedy
    (drop the higher id of every qualifying pair); cross-batch, the
    store always wins (an accepted document can never be retroactively
    dropped — the append-only property a downstream training run
    needs).  Documents shorter than the shingle width carry no
    signature and always survive (near_dup_pairs' documented
    exclusion).

    Store layout (the 100 TB shape): one row per ACCEPTED doc per LSH
    band — (band_key, doc shingles) — written as parquet PARTITIONED BY
    ``band_bucket`` (``xxhash64(band_key) mod store_partitions``) so
    the per-batch cross-batch screen reads ONLY the partitions that can
    contain the batch's band keys: the batch's bucket set is collected
    driver-side (bounded by ``store_partitions`` — metadata-sized, the
    ``ivf_topk_indexed`` probe pattern) and the scan carries
    ``band_bucket IN (...)`` as PartitionFilters (plan-pinned in
    tests).  A hash bucket, not a raw band-key prefix, because raw
    minhash-value prefixes have unbounded cardinality and skew.  The
    store grows by ``num_bands`` rows per accepted doc — the DEDUPED
    corpus, not the raw stream — so it stores each survivor's shingle
    set ``num_bands`` times: the deliberate price of co-locating the
    exact-verify payload with the band row (the storage-lean
    alternative — a separate unduplicated signature table joined by
    stored-doc id — would make the verify step a full scan of that
    table every batch, the exact cost this layout removes).  Per-batch
    writes create ``store_partitions`` directories (one writer task
    per bucket); :func:`compact_near_dup_store` folds the per-batch
    files between cleanly-terminated runs.  ``store_partitions``
    trades per-batch fixed overhead (directory listing + job commit,
    ~2-3 s across a whole toy-scale run, amortized to noise at real
    batch sizes) against read-pruning granularity and writer
    parallelism at scale — size it like a bucket count, roughly
    cluster-core order.

    Replay safety: every write is keyed by a ``_commit_id`` partition
    (checkpoint token + batch id) and uses dynamic partition overwrite,
    and the store read EXCLUDES the current commit id — so a batch
    replayed after a crash between the appends and the checkpoint
    commit recomputes the identical drop set (its own half-committed
    rows are invisible to it) and rewrites exactly its own partitions:
    a no-op, not a duplication.

    Batch-split sensitivity is inherent to streaming greedy dedup (a
    doc dropped intra-batch never enters the store, so A~B, B~C chains
    can resolve differently under different splits); with deterministic
    batches the result is exactly reproducible, which is what the
    oracle entry pins.  Scale shape per batch: ONE signature pass over
    the batch (_minhash_table's explode->aggregate), band equi-joins
    batch-vs-batch and batch-vs-pruned-store (never all-pairs), exact
    Jaccard verify against stored shingle sets.  Returns the started
    StreamingQuery."""
    token = _commit_token(checkpoint_path)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        _near_dup_process_batch(
            batch_df,
            batch_id,
            out_path=out_path,
            store_path=store_path,
            token=token,
            text_col=text_col,
            id_col=id_col,
            threshold=threshold,
            num_hashes=num_hashes,
            num_bands=num_bands,
            shingle_k=shingle_k,
            store_partitions=store_partitions,
            max_bucket_size=max_bucket_size,
        )

    return (
        raw_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def near_dup_store_scan(
    spark: SparkSession,
    store_path: str,
    buckets: list[int] | None = None,
    exclude_commit: str | None = None,
) -> DataFrame:
    """Scan of the persistent near-dup signature store, pruned to the
    band buckets that can match (``band_bucket IN (...)`` — a partition
    filter, so unprobed directories are never listed or read) and
    excluding a replaying batch's own half-committed partition.  Raises
    loudly on a pre-partitioned legacy store (flat ``(doc_id, minhash,
    shingles)`` rows) — reading it as absent would silently skip the
    cross-batch screen; migrate with
    :func:`migrate_legacy_near_dup_store`.  Manifest-aware: after a
    :func:`compact_near_dup_store` commit the store lives under the
    current generation (one ``listStatus`` to resolve; a
    never-compacted store reads as before)."""
    from airflow_etl_minio_to_postgres_spark.sources.manifest import (
        resolve_data_root,
    )

    store = spark.read.parquet(resolve_data_root(spark, store_path))
    required = {"band_key", "band_bucket", "_commit_id"}
    if not required <= set(store.columns):
        raise ValueError(
            f"near-dup store at {store_path!r} has columns "
            f"{sorted(store.columns)} but this reader needs "
            f"{sorted(required)} (band-partitioned layout since round "
            "11); run migrate_legacy_near_dup_store before resuming"
        )
    if exclude_commit is not None:
        store = store.where(F.col("_commit_id") != F.lit(exclude_commit))
    if buckets is not None:
        store = store.where(
            F.col("band_bucket").isin([int(b) for b in buckets])
        )
    return store


def _intra_batch_drops(
    banded: DataFrame,
    sets: DataFrame,
    id_col: str,
    threshold: float,
    max_bucket_size: int | None,
) -> DataFrame:
    """Intra-batch pairwise-greedy drop set (the higher id of every
    qualifying pair) — shared verbatim by the streaming sink and the
    batch face :func:`near_dup_against_store`, so the two paths cannot
    drift."""
    from airflow_etl_minio_to_postgres_spark.functions.dedup import (
        jaccard_expr,
        salted_band_sides,
    )

    a_fan, b_fan, join_keys = salted_band_sides(
        banded, id_col, "band_key", max_bucket_size
    )
    cand = (
        a_fan.select(F.col(id_col).alias("id_a"), *join_keys)
        .join(
            b_fan.select(F.col(id_col).alias("id_b"), *join_keys),
            join_keys,
        )
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.join(
            sets.select(
                F.col(id_col).alias("id_a"),
                F.col("shingles").alias("sh_a"),
            ),
            "id_a",
        )
        .join(
            sets.select(
                F.col(id_col).alias("id_b"),
                F.col("shingles").alias("sh_b"),
            ),
            "id_b",
        )
        .where(
            jaccard_expr(F.col("sh_a"), F.col("sh_b")) >= F.lit(threshold)
        )
        .select(F.col("id_b").alias(id_col))
    )


def _store_screen_drops(
    spark: SparkSession,
    banded: DataFrame,
    sets: DataFrame,
    store_path: str,
    *,
    id_col: str,
    threshold: float,
    store_partitions: int,
    max_bucket_size: int | None,
    exclude_commit: str | None = None,
) -> DataFrame:
    """Batch-vs-STORE drop set: ids of batch docs that near-duplicate an
    already-accepted stored doc.  The batch's bucket set is collected
    driver-side (bounded by ``store_partitions`` — metadata-sized, the
    ``ivf_topk_indexed`` probe pattern) and the store scan is pruned to
    those partitions.  Shared verbatim by the streaming sink and
    :func:`near_dup_against_store`."""
    from airflow_etl_minio_to_postgres_spark.functions.dedup import (
        jaccard_expr,
        salted_join_sides,
    )

    bucket_of = F.pmod(
        F.xxhash64(F.col("band_key")), F.lit(int(store_partitions))
    ).cast("int")
    buckets = sorted(
        r[0]
        for r in banded.select(bucket_of.alias("b")).distinct().collect()
    )
    store_banded = near_dup_store_scan(
        spark, store_path, buckets, exclude_commit=exclude_commit
    ).select(
        F.col(id_col).alias("_sid"),
        "band_key",
        F.col("shingles").alias("sh_s"),
    )
    # two-frame salting: a hot band bucket shared by l batch rows and r
    # store rows does l*r comparisons on one task; with max_bucket_size
    # set each hot bucket salts its LARGER side and replicates the
    # smaller (right_id enables the per-bucket swap — a store bucket
    # far bigger than the batch's can split below r comparisons/task)
    l_fan, r_fan, cross_keys = salted_join_sides(
        banded,
        store_banded,
        id_col,
        "band_key",
        max_bucket_size,
        right_id="_sid",
    )
    return (
        l_fan.join(r_fan, cross_keys)
        # one row per (batch doc, stored doc) candidate; sh_s is a
        # function of _sid, so keeping the first duplicate is exact
        .dropDuplicates([id_col, "_sid"])
        .join(sets, id_col)
        .where(
            jaccard_expr(F.col("shingles"), F.col("sh_s"))
            >= F.lit(threshold)
        )
        .select(id_col)
    )


def near_dup_against_store(
    df: DataFrame,
    store_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 8,
    num_bands: int = 4,
    shingle_k: int = 3,
    store_partitions: int = 64,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """BATCH face of :func:`streaming_near_dup_dedup`'s screen: dedup a
    new delivery against the accepted corpus (and within itself)
    WITHOUT a streaming query — the backfill/ad-hoc shape ("does this
    vendor drop add anything?").  Same policies as the sink, through
    the SAME shared helpers so the two paths cannot drift: intra-batch
    pairwise greedy (drop the higher id of each qualifying pair), then
    store-always-wins against the band-bucket-partitioned signature
    store (scan pruned to the delivery's buckets).

    READ-ONLY by design: survivors are returned as a lazy DataFrame;
    nothing is appended to the store — growing it is the streaming
    sink's job (whose commit-id machinery makes appends replay-safe),
    or a deliberate migrate/compact operation.  A missing or legacy
    store raises loudly (a silently-skipped screen is the failure mode
    this family refuses); ``num_hashes``/``num_bands``/``shingle_k``
    MUST match the parameters the store was built with — signatures
    from mismatched parameters never collide correctly.

    The signature table is persisted via the dedup family's tracked
    cache (multiple consumers: banding, shingle verify) — call
    ``functions.dedup.release_caches()`` when done, as after any batch
    dedup operator."""
    from airflow_etl_minio_to_postgres_spark.functions.dedup import (
        _minhash_table,
        _persist_tracked,
        band_keys_expr,
    )

    spark = df.sparkSession
    if not _fs_exists(spark, store_path):
        raise ValueError(
            f"near-dup store at {store_path!r} does not exist; "
            "near_dup_against_store screens against an EXISTING store "
            "(build one with streaming_near_dup_dedup)"
        )
    rows_per_band = num_hashes // num_bands
    sig = _persist_tracked(
        _minhash_table(df, text_col, id_col, num_hashes, shingle_k)
    )
    banded = sig.select(
        F.col(id_col),
        F.explode(
            band_keys_expr(F.col("minhash"), num_bands, rows_per_band)
        ).alias("band_key"),
    )
    sets = sig.select(id_col, "shingles")
    dropped = _intra_batch_drops(
        banded, sets, id_col, threshold, max_bucket_size
    ).unionByName(
        _store_screen_drops(
            spark,
            banded,
            sets,
            store_path,
            id_col=id_col,
            threshold=threshold,
            store_partitions=store_partitions,
            max_bucket_size=max_bucket_size,
        )
    )
    return df.join(dropped.distinct(), id_col, "left_anti")


def _near_dup_process_batch(
    batch_df: DataFrame,
    batch_id: int,
    *,
    out_path: str,
    store_path: str,
    token: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 8,
    num_bands: int = 4,
    shingle_k: int = 3,
    store_partitions: int = 64,
    max_bucket_size: int | None = None,
) -> None:
    """One :func:`streaming_near_dup_dedup` micro-batch — module-level
    so the replay contract (same batch twice == once) is directly
    testable without killing a live stream.

    ``max_bucket_size`` wires the dedup family's shared hot-bucket
    salting (``functions/dedup.py salted_band_sides`` — exact by
    construction) into the INTRA-batch candidate self-join: low-entropy
    batches (shared boilerplate) concentrate whole bands into hot
    buckets whose m^2 pairwise comparisons land on single tasks
    (measured: a 50k-doc boilerplate-heavy batch spends its wall-clock
    almost entirely there).  None = unsalted, the zero-overhead
    default, same posture as the batch operators.  The batch-vs-STORE
    join gets the two-frame form (``salted_join_sides``: batch side
    salted, store side replicated into the sub-groups) under the same
    knob."""
    from airflow_etl_minio_to_postgres_spark.functions.dedup import (
        _minhash_table,
        band_keys_expr,
    )
    from airflow_etl_minio_to_postgres_spark.sources.manifest import (
        resolve_data_root,
    )

    spark = batch_df.sparkSession
    # post-compaction the store lives under the current generation; the
    # batch's accepted signatures must land there too
    store_path = resolve_data_root(spark, store_path)
    commit_id = f"{token}-{batch_id}"
    rows_per_band = num_hashes // num_bands
    bucket_of = F.pmod(
        F.xxhash64(F.col("band_key")), F.lit(int(store_partitions))
    ).cast("int")
    sig = _minhash_table(
        batch_df, text_col, id_col, num_hashes, shingle_k
    ).persist()
    banded = sig.select(
        F.col(id_col),
        F.explode(
            band_keys_expr(F.col("minhash"), num_bands, rows_per_band)
        ).alias("band_key"),
    )
    sets = sig.select(id_col, "shingles")
    dropped = _intra_batch_drops(
        banded, sets, id_col, threshold, max_bucket_size
    )
    if _fs_exists(spark, store_path):
        cross = _store_screen_drops(
            spark,
            banded,
            sets,
            store_path,
            id_col=id_col,
            threshold=threshold,
            store_partitions=store_partitions,
            max_bucket_size=max_bucket_size,
            exclude_commit=commit_id,
        )
        dropped = dropped.unionByName(cross)
    # Materialize the drop set BEFORE any write: its plan reads the
    # store, and the store write below must not race a pending store
    # scan (file listings are snapshotted at DataFrame creation, but an
    # eager boundary makes the ordering explicit rather than
    # incidental).  The drop set is id-only.
    dropped_ids = dropped.distinct().persist()
    dropped_ids.count()
    (
        batch_df.join(dropped_ids, id_col, "left_anti")
        .withColumn("_commit_id", F.lit(commit_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_commit_id")
        .parquet(out_path)
    )
    (
        banded.join(dropped_ids, id_col, "left_anti")
        .join(sets, id_col)
        .withColumn("band_bucket", bucket_of)
        .withColumn("_commit_id", F.lit(commit_id))
        # One writer task per band bucket: without this shuffle every
        # upstream task writes a sliver into every bucket directory —
        # up to (shuffle partitions x store_partitions) tiny files PER
        # BATCH (measured 2x the whole sink's wall-clock at sf0.1).
        # The shuffled rows are the batch's accepted signatures only.
        .repartition(int(store_partitions), "band_bucket")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("band_bucket", "_commit_id")
        .parquet(store_path)
    )
    dropped_ids.unpersist()
    sig.unpersist()
    if max_bucket_size is not None:
        # the salting helpers persist their fan-outs via the family's
        # tracked-cache list; a long-running stream would accumulate
        # one set per micro-batch — free them with the batch
        from airflow_etl_minio_to_postgres_spark.functions.dedup import (
            release_caches,
        )

        release_caches()


def migrate_legacy_near_dup_store(
    spark: SparkSession,
    store_path: str,
    num_bands: int = 4,
    num_hashes: int = 8,
    store_partitions: int = 64,
) -> int:
    """One-shot migration of a pre-round-11 flat signature store
    (``(doc_id, minhash, shingles)`` rows, appended unpartitioned) to
    the band-partitioned layout :func:`near_dup_store_scan` reads —
    the deliberate rewrite its error message points at.  Band keys are
    recomputed from the stored minhash signatures (the same
    ``band_keys_expr`` the writer used), so the migrated store is
    band-for-band identical to one written natively; migrated rows
    carry commit id ``legacy-0``.  Idempotent: an already-migrated
    store is left untouched.  Returns the number of store rows after
    migration.  Local-FS only (the swap uses ``os.replace``), like
    :func:`migrate_legacy_rollup`."""
    from airflow_etl_minio_to_postgres_spark.functions.dedup import (
        band_keys_expr,
    )
    from airflow_etl_minio_to_postgres_spark.sources.files import (
        _local_path,
    )

    store_path = _local_path(store_path)
    df = spark.read.parquet(store_path)
    if "band_key" in df.columns:
        return df.count()
    if "minhash" not in df.columns:
        raise ValueError(
            f"store at {store_path!r} has columns {sorted(df.columns)}: "
            "neither the band-partitioned nor the legacy flat layout"
        )
    rows_per_band = num_hashes // num_bands
    id_col = [c for c in df.columns if c not in ("minhash", "shingles")][0]
    migrated = (
        df.select(
            F.col(id_col),
            "shingles",
            F.explode(
                band_keys_expr(F.col("minhash"), num_bands, rows_per_band)
            ).alias("band_key"),
        )
        .withColumn(
            "band_bucket",
            F.pmod(
                F.xxhash64(F.col("band_key")), F.lit(int(store_partitions))
            ).cast("int"),
        )
        .withColumn("_commit_id", F.lit("legacy-0"))
    )
    import shutil

    tmp = store_path.rstrip("/") + "__migrate_tmp"
    old = store_path.rstrip("/") + "__migrate_old"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        # one writer task per bucket — without this every shuffle task
        # writes a sliver into every bucket dir (up to shuffle_partitions
        # x store_partitions tiny files, the fragmentation the streaming
        # sink's own repartition exists to prevent)
        migrated.repartition(int(store_partitions), "band_bucket")
        .write.mode("overwrite")
        .partitionBy("band_bucket", "_commit_id")
        .parquet(tmp)
    )
    shutil.rmtree(old, ignore_errors=True)
    os.replace(store_path, old)
    os.replace(tmp, store_path)
    shutil.rmtree(old, ignore_errors=True)
    return spark.read.parquet(store_path).count()


def streaming_ivf_index_upsert(
    raw_stream: DataFrame,
    centroids: DataFrame,
    index_path: str,
    checkpoint_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Continuously maintain a :func:`...functions.similarity.write_ivf_index`
    serving layout from a stream of embeddings — the ANN-index face of
    the continuous-aggregate pattern: new vectors land in their cell
    partitions as they arrive, and :func:`ivf_topk_indexed` /
    :func:`ivf_topk_batch` serve from the same path with the same
    partition-pruned scans, no rebuild.

    Per batch: ONE assignment pass against the broadcast centroid
    table (``ivf_assign`` — the index's cell contract, identical
    tie-breaks to the batch builder), one shuffle keyed on the cell id
    so each cell gets about one file per batch, one
    dynamic-partition-overwrite write into ``cid=<c>/_commit_id=<k>``
    directories.  Crash-replay safe by the shared commit-id mechanism:
    a replayed batch rewrites exactly its own ``(cid, _commit_id)``
    partitions.  Centroids are FROZEN for the life of the stream —
    reassigning cells would move existing vectors, which an append-only
    maintainer must not do; retrain + rebuild (``write_ivf_index``) is
    the deliberate operation for centroid drift, exactly like the
    rollup's legacy migration.  Per-cell file fragmentation grows one
    file per batch; fold with ``sources/files.py compact_parquet`` per
    cell directory (or rebuild) between cleanly-terminated runs.
    Returns the started StreamingQuery."""
    token = _commit_token(checkpoint_path)
    cents = centroids.select("cid", "cvec")

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        _ivf_index_process_batch(
            batch_df, batch_id, index_path, token, cents, id_col, vec_col
        )

    return (
        raw_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def _ivf_index_process_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    token: str,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """One :func:`streaming_ivf_index_upsert` micro-batch — module-level
    so the replay contract (same batch twice == once) is directly
    testable, like the other foreachBatch sinks."""
    from airflow_etl_minio_to_postgres_spark.functions.similarity import (
        ivf_assign,
    )
    from airflow_etl_minio_to_postgres_spark.sources.manifest import (
        resolve_data_root,
    )

    assigned = ivf_assign(batch_df, centroids, id_col, vec_col)
    (
        batch_df.join(assigned, id_col)
        .withColumn("_commit_id", F.lit(f"{token}-{batch_id}"))
        .repartition("cid")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        # batches land in the index's CURRENT generation: after a
        # manifest-based compaction the root holds only the manifest
        # and generation prefixes, and serving resolves the same way
        .partitionBy("cid", "_commit_id")
        .parquet(resolve_data_root(batch_df.sparkSession, index_path))
    )


def streaming_inverted_index_upsert(
    raw_stream: DataFrame,
    index_path: str,
    checkpoint_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
):
    """Continuously maintain a
    :func:`...functions.text.write_inverted_index` BM25 serving layout
    from a stream of documents — the SPARSE twin of
    :func:`streaming_ivf_index_upsert`, completing the symmetry:
    build / stream-maintain / serve for both retrieval paths.

    Per batch: one tokenize + tf pass, postings repartitioned on the
    term-hash bucket (about one file per touched bucket per batch),
    one dynamic-partition-overwrite write into
    ``term_bucket=<b>/_commit_id=<k>`` directories — a replayed batch
    rewrites exactly its own partitions.  The ``_stats`` sidecar the
    serving path needs (n_docs, avgdl, n_buckets) is NOT
    batch-decomposable by overwrite, so it merges EXACT integer
    partials — ``(n_docs, sum_dl)``, the rollup's micro-unit policy —
    and ``avgdl`` is derived by one division at write time (the same
    long-sum/count division the batch writer's ``F.avg`` performs, so
    streamed and one-shot sidecars agree bit-for-bit).  Replay safety
    for the merge is the rollup's marker mechanism verbatim: the
    last-merged ``(token, batch_id)`` rides a ``_last_batch`` file
    promoted by the SAME atomic swap as the stats it describes.  The
    marker is ALSO the lineage guard: pointing a NEW checkpoint at an
    existing index raises before any write (a foreign token would
    double-count both postings and stats — the drift monitor's
    changed-reference stance); resume the original checkpoint or
    rebuild.

    Like the IVF maintainer, append-only: a document re-delivered in a
    LATER batch duplicates its postings and inflates the stats — dedup
    upstream (exact_dedup / the near-dup screen); rebuild
    (``write_inverted_index``) is the documented re-base operation.
    Local-FS stats path (atomic swap).  Returns the started
    StreamingQuery."""
    from airflow_etl_minio_to_postgres_spark.sources.files import (
        _local_path,
    )

    index_path_local = _local_path(index_path)
    token = _commit_token(checkpoint_path)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        _inv_index_process_batch(
            batch_df,
            batch_id,
            index_path_local,
            token,
            text_col,
            id_col,
            n_buckets,
        )

    return (
        raw_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def _inv_index_process_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    token: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> None:
    """One :func:`streaming_inverted_index_upsert` micro-batch —
    module-level so both replay contracts (postings: same batch twice
    == once; stats: an already-merged batch is a no-op) are directly
    testable."""
    from airflow_etl_minio_to_postgres_spark.functions.text import (
        WHITESPACE,
    )
    from airflow_etl_minio_to_postgres_spark.sources.files import (
        _rewrite_in_place,
    )

    spark = batch_df.sparkSession
    from airflow_etl_minio_to_postgres_spark.sources.manifest import (
        resolve_data_root,
    )

    from airflow_etl_minio_to_postgres_spark.sources.files import (
        _local_path,
    )

    # after a manifest-based compaction the postings AND the _stats
    # sidecar live under the current generation — resolve once per
    # batch (one listStatus; a never-compacted index resolves to root)
    index_path = resolve_data_root(spark, index_path)
    # the replay marker and the stats merge are read with local-FS
    # calls and written via _rewrite_in_place (os.replace — local-FS
    # only).  _local_path unwraps file:// URIs (so a scheme-qualified
    # resolve_data_root result still finds the marker instead of
    # silently treating it as absent and double-merging a replayed
    # batch) and raises LOUDLY for object-store schemes — the
    # documented 'Local-FS stats path' contract, enforced before any
    # write happens.
    stats_path = os.path.join(_local_path(index_path), "_stats")
    marker = os.path.join(stats_path, "_last_batch")
    # Lineage guard BEFORE any write: the marker only disambiguates
    # replays within ONE checkpoint lineage.  A NEW checkpoint pointed
    # at an existing index would silently double-count BOTH the
    # postings (old _commit_id partitions are never overwritten by the
    # new token's commit ids) and the sidecar stats partials — refuse
    # loudly instead, the drift monitor's changed-reference stance.
    last_id_merged = -1
    if os.path.exists(marker):
        with open(marker, encoding="utf-8") as f:
            last_token, _, last_id = f.read().strip().partition(":")
        if last_token != token:
            raise ValueError(
                f"inverted index at {index_path!r} was maintained under "
                f"a different checkpoint lineage (marker token "
                f"{last_token!r}, this stream's token {token!r}) — "
                "merging would double-count postings and sidecar "
                "stats.  Resume the original checkpoint, or rebuild "
                "with write_inverted_index and a fresh checkpoint."
            )
        last_id_merged = int(last_id)
    if batch_id <= last_id_merged:
        # crash-replayed batch: the marker is promoted atomically WITH
        # the stats, only after the postings commit — so both the
        # postings and the stats for this batch are already on disk
        return
    words = F.split(F.lower(F.trim(F.col(text_col))), WHITESPACE)
    d = batch_df.select(F.col(id_col), words.alias("_w"))
    # dl rides through the explode (function of the doc; max recovers
    # it) — no batch-sized length join, matching the batch builder
    tf = (
        d.select(
            F.col(id_col),
            F.size(F.col("_w")).alias("_dl"),
            F.explode(F.col("_w")).alias("term"),
        )
        .where(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.max("_dl").alias("dl"))
    )
    postings = (
        tf.withColumn(
            "term_bucket",
            F.pmod(F.xxhash64(F.col("term")), F.lit(int(n_buckets))).cast(
                "int"
            ),
        )
        .withColumn("_commit_id", F.lit(f"{token}-{batch_id}"))
        .repartition(int(n_buckets), "term_bucket")
    )
    (
        postings.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("term_bucket", "_commit_id")
        .parquet(index_path)
    )

    partial = d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.col("_w"))).cast("long").alias("sum_dl"),
    )
    if os.path.exists(stats_path):
        on_disk = spark.read.parquet(stats_path)
        if "sum_dl" not in on_disk.columns:
            raise ValueError(
                f"stats sidecar at {stats_path!r} has no exact sum_dl "
                "column (a one-shot write_inverted_index sidecar?) — "
                "rebuild the index with the streaming maintainer or "
                "keep serving the batch-built layout"
            )
        prev = on_disk.select("n_docs", "sum_dl")
        merged = prev.unionByName(partial).agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("sum_dl").cast("long").alias("sum_dl"),
        )
    else:
        merged = partial
    stats = merged.select(
        "n_docs",
        "sum_dl",
        (F.col("sum_dl") / F.col("n_docs")).alias("avgdl"),
        F.lit(int(n_buckets)).alias("n_buckets"),
    )
    _rewrite_in_place(
        stats, stats_path, extra_files={"_last_batch": f"{token}:{batch_id}"}
    )


def compact_ivf_index(
    spark: SparkSession,
    index_path: str,
    compact_seq: int = 0,
    keep_last: int = 1,
) -> int:
    """Housekeeping for a streamed :func:`streaming_ivf_index_upsert`
    index: fold the per-batch ``_commit_id`` partitions into ONE
    ``compact-<seq>`` commit per cell, rewriting each cell's
    one-file-per-batch fragmentation into (about) one file — the
    per-cell folding the maintainer's docstring prescribes.  The
    ``cid`` partition level is PRESERVED (a flat ``compact_parquet``
    over the index root would destroy the directory layout
    :func:`...functions.similarity.ivf_topk_indexed` /
    ``ivf_topk_batch`` prune on), so serving reads the identical
    partition-filtered plan before and after — bit-equal results,
    fewer file opens.

    Same run-window contract as :func:`compact_near_dup_store`: only
    between CLEANLY-terminated stream runs — compaction folds a
    half-committed replay partition into the compact commit, which the
    replaying batch's dynamic overwrite would then duplicate rather
    than replace.  ``availableNow`` runs terminate cleanly by
    construction.  Also accepts a batch :func:`write_ivf_index` layout
    (no ``_commit_id``) and simply refragments it per cell.

    OBJECT-STORE CAPABLE — the family's first manifest-committed
    maintenance op (``sources/manifest.py``): the compacted layout
    lands in a NEW immutable ``_gen-<seq>`` prefix, a versioned manifest
    object is atomically PUBLISHED (single PUT, never a rename — the
    Delta-log shape, so ``file://`` URIs, HDFS, and s3a all work with
    no local-FS downgrade), and unreferenced generations are GC'd
    strictly after the publish.  A crash at ANY point leaves a
    servable index: pre-publish, readers resolve the old generation
    (the orphan prefix is collected next run); post-publish/pre-GC,
    readers already resolve the new one.  The serving paths
    (``ivf_topk_indexed`` / ``ivf_topk_batch``) and the streaming
    maintainer resolve the manifest on every call; an index that never
    compacted has no manifest and reads exactly as before.
    ``keep_last`` is the GC grace window (retain the N most recent
    published generations for long-running readers; default 1).
    Idempotent in content.  Returns the index row count."""
    from airflow_etl_minio_to_postgres_spark.sources.manifest import (
        _join,
        gc_generations,
        next_seq,
        publish_generation,
        resolve_data_root,
    )

    data_root = resolve_data_root(spark, index_path)
    df = spark.read.parquet(data_root)
    if "cid" not in df.columns:
        raise ValueError(
            f"index at {index_path!r} has columns {sorted(df.columns)} — "
            "not an IVF serving layout (no cid partition column)"
        )
    has_commits = "_commit_id" in df.columns
    data_cols = [
        c for c in df.columns if c not in ("cid", "_commit_id")
    ]
    compacted = df.select(*data_cols, "cid")
    part_cols = ["cid"]
    if has_commits:
        compacted = compacted.withColumn(
            "_commit_id", F.lit(f"compact-{int(compact_seq)}")
        )
        part_cols.append("_commit_id")
    # one shuffle keyed on the partition column -> one writer task
    # (about one file) per cell
    compacted = compacted.repartition("cid")
    seq = next_seq(spark, index_path)
    gen = f"_gen-{seq:06d}"
    (
        compacted.write.mode("overwrite")
        .partitionBy(*part_cols)
        .parquet(_join(index_path, gen))
    )
    publish_generation(spark, index_path, seq, gen)
    gc_generations(spark, index_path, seq, gen, keep_last=keep_last)
    return spark.read.parquet(_join(index_path, gen)).count()


def compact_inverted_index(
    spark: SparkSession,
    index_path: str,
    compact_seq: int = 0,
    keep_last: int = 1,
) -> int:
    """Housekeeping for a streamed
    :func:`streaming_inverted_index_upsert` index — the sparse face of
    :func:`compact_ivf_index`: fold the per-batch ``_commit_id``
    posting partitions into ONE ``compact-<seq>`` commit per term
    bucket, preserving the ``term_bucket`` partition level the serving
    path prunes on.  Same run-window contract as the other compactors:
    only between cleanly-terminated runs.  Also accepts a batch
    :func:`...functions.text.write_inverted_index` layout (no
    ``_commit_id``) and simply refragments it per bucket.

    OBJECT-STORE CAPABLE — the manifest protocol's second adopter
    (``sources/manifest.py``; :func:`compact_ivf_index` is the dense
    twin), with the adopter-specific wrinkle the RUNBOOK prescribes:
    this index is SELF-DESCRIBING via its ``_stats`` sidecar (merged
    corpus stats + the maintainer's replay/lineage marker), so the
    sidecar is COPIED INTO the new ``_gen-<seq>`` prefix before the
    manifest publish — one pointer flip commits postings and stats
    together, and the serving/maintainer paths find both under the
    resolved generation.  GC then also collects the superseded
    root-level ``_stats`` left behind by the first commit.  Crash
    windows identical to the dense twin: pre-publish, readers stay on
    the old generation; post-publish/pre-GC, stale prefixes are
    unreferenced storage for the next run.  ``keep_last`` is the GC
    grace window (retain the N most recent published generations for
    long-running readers; default 1).  Idempotent in content.
    Returns the postings row count."""
    from airflow_etl_minio_to_postgres_spark.sources.manifest import (
        _join,
        copy_tree,
        gc_generations,
        next_seq,
        publish_generation,
        resolve_data_root,
    )

    data_root = resolve_data_root(spark, index_path)
    df = spark.read.parquet(data_root)
    if "term_bucket" not in df.columns:
        raise ValueError(
            f"index at {index_path!r} has columns {sorted(df.columns)} — "
            "not an inverted-index layout (no term_bucket partition "
            "column)"
        )
    has_commits = "_commit_id" in df.columns
    data_cols = [
        c for c in df.columns if c not in ("term_bucket", "_commit_id")
    ]
    compacted = df.select(*data_cols, "term_bucket")
    part_cols = ["term_bucket"]
    if has_commits:
        compacted = compacted.withColumn(
            "_commit_id", F.lit(f"compact-{int(compact_seq)}")
        )
        part_cols.append("_commit_id")
    compacted = compacted.repartition("term_bucket")

    seq = next_seq(spark, index_path)
    gen = f"_gen-{seq:06d}"
    (
        compacted.write.mode("overwrite")
        .partitionBy(*part_cols)
        .parquet(_join(index_path, gen))
    )
    # the sidecar (merged stats + replay/lineage marker) rides INTO the
    # generation, so the manifest flip publishes the whole index
    copy_tree(
        spark,
        _join(data_root, "_stats"),
        _join(index_path, gen, "_stats"),
    )
    publish_generation(spark, index_path, seq, gen)
    gc_generations(
        spark, index_path, seq, gen, legacy_sidecars=("_stats",),
        keep_last=keep_last,
    )
    return spark.read.parquet(_join(index_path, gen)).count()


def compact_near_dup_store(
    spark: SparkSession,
    store_path: str,
    compact_seq: int = 0,
    keep_last: int = 1,
) -> int:
    """Housekeeping for the band-partitioned near-dup signature store:
    merge the per-batch ``_commit_id`` partitions into ONE
    ``compact-<seq>`` commit per band bucket, rewriting each bucket's
    many per-batch files into (about) one — the standing fragmentation
    of every streaming append sink (one file per batch per partition),
    paid back as per-file open + footer costs on every cross-batch
    screen.

    MUST run only between CLEANLY-terminated stream runs: the store
    read during a crash-replayed batch excludes that batch's own
    ``_commit_id`` partition, and compaction folds every partition —
    including a half-committed one — into the compact commit, where the
    replaying batch would see its own first-attempt survivors and drop
    everything as self-duplicates.  A crashed run must be restarted
    (and allowed to finish, which makes the replay a no-op) BEFORE
    compacting.  ``availableNow`` runs terminate cleanly by
    construction, so the natural slot is between scheduled backfills.

    OBJECT-STORE CAPABLE — the manifest protocol's fourth adopter
    (``sources/manifest.py``): the compacted store lands in a new
    ``_gen-<seq>`` prefix PRESERVING the ``band_bucket`` partition
    level the screen prunes on, the versioned manifest is the atomic
    publish, and GC runs strictly after (``keep_last`` = grace
    window).  The store scan and the streaming sink resolve the
    current generation per call; a never-compacted store has no
    manifest and reads as before.  Idempotent in content:
    re-compacting a compacted store rewrites the same rows.  Returns
    the store row count."""
    from airflow_etl_minio_to_postgres_spark.sources.manifest import (
        _join,
        gc_generations,
        next_seq,
        publish_generation,
        resolve_data_root,
    )

    data_root = resolve_data_root(spark, store_path)
    df = spark.read.parquet(data_root)
    required = {"band_key", "band_bucket", "_commit_id"}
    if not required <= set(df.columns):
        raise ValueError(
            f"store at {store_path!r} is not the band-partitioned layout "
            "(run migrate_legacy_near_dup_store first)"
        )
    data_cols = [
        c for c in df.columns if c not in ("band_bucket", "_commit_id")
    ]
    compacted = (
        df.select(*data_cols, "band_bucket")
        .withColumn("_commit_id", F.lit(f"compact-{int(compact_seq)}"))
        # one shuffle keyed on the partition column -> one writer task
        # (one file) per band bucket
        .repartition("band_bucket")
    )
    seq = next_seq(spark, store_path)
    gen = f"_gen-{seq:06d}"
    (
        compacted.write.mode("overwrite")
        .partitionBy("band_bucket", "_commit_id")
        .parquet(_join(store_path, gen))
    )
    publish_generation(spark, store_path, seq, gen)
    gc_generations(spark, store_path, seq, gen, keep_last=keep_last)
    return spark.read.parquet(_join(store_path, gen)).count()


def migrate_legacy_rollup(spark: SparkSession, out_path: str) -> int:
    """One-shot migration of a pre-micro-unit rollup table (double
    ``sum_value``) to the exact bigint ``sum_value_micros`` storage
    contract that :func:`streaming_rollup_upsert`'s schema guard
    enforces — the deliberate rewrite the guard's error message points
    at, instead of the sink improvising a conversion mid-stream.

    Idempotent: an already-migrated table is left untouched.  The
    conversion is ``round(sum_value * 1e6)`` — the same quantization
    the writer applies per value, so post-migration totals merge with
    new micro-unit partials on equal footing (legacy DOUBLE totals
    carry whatever float error they accumulated before migration; that
    error is frozen, not compounded, from here on).  Rollup tables are
    dimension-scale by construction, so the read-rewrite (and the
    returned row count) is metadata-sized work.  Returns the number of
    rows migrated (0 when already migrated)."""
    from airflow_etl_minio_to_postgres_spark.sources.files import (
        _rewrite_in_place,
    )

    df = spark.read.parquet(out_path)
    names = set(df.columns)
    if "sum_value_micros" in names:
        return 0
    if "sum_value" not in names:
        raise ValueError(
            f"rollup at {out_path!r} has columns {sorted(names)} — "
            "neither the legacy (sum_value) nor the current "
            "(sum_value_micros) contract; refusing to guess"
        )
    migrated = df.select(
        F.col("hour").cast("timestamp").alias("hour"),
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.round(F.col("sum_value") * F.lit(1e6))
        .cast("long")
        .alias("sum_value_micros"),
    )
    n = migrated.count()
    _rewrite_in_place(migrated, out_path)
    return n


def run_stateful_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream -> stateful counts -> final value per user (max of cumulative
    emissions, robust to multi-batch splits of the input).

    The explicit ``select("user_id")`` matters: Catalyst cannot prune
    columns through the opaque ``applyInPandasWithState`` operator, so
    without it every column (including the wide ``props`` JSON string)
    crosses the Arrow boundary per micro-batch — ~5x slower at sf0.1.
    """
    # Deliberately NOT backlog-sized (no source_paths): this operator
    # crosses to Python per group (applyInPandasWithState), so collapsing
    # state partitions serializes real per-group work — measured 1.8 s at
    # the session's parallelism vs 3.6 s at the backlog-derived single
    # partition.  Backlog sizing pays only where state-store setup
    # dominates compute (pure-JVM stateful aggregations and joins).
    out = run_available_now(
        stateful_user_counts(stream_events(spark, sf_dir).select("user_id")),
        output_mode="update",
    )
    return out.groupBy("user_id").agg(F.max("n_events").alias("n_events"))


def streaming_drift_monitor(
    raw_stream: DataFrame,
    ref: DataFrame,
    value_col: str,
    out_path: str,
    checkpoint_path: str,
    n_buckets: int = 10,
    by: list[str] | None = None,
):
    """Continuously monitor a stream's value distribution against a
    FROZEN reference — the streaming face of
    :func:`...operators.audit.population_stability_index`: production
    drift monitoring runs per ingest micro-batch, not as a nightly
    batch diff, so the PSI operator needs a maintainer the way the IVF
    and inverted indexes have one.

    At monitor start the reference is folded ONCE into its equal-mass
    cutpoints and per-bucket counts (``psi_ref_cuts`` /
    ``psi_bucket_counts`` — the SAME shared helpers the batch operator
    calls, so frozen state and batch math cannot drift) and lands in a
    ``_ref`` sidecar under ``out_path`` (cuts + counts + n_buckets:
    self-describing, the inverted index's ``_stats`` pattern).  The
    reference is frozen for the monitor's life — the IVF
    centroid-freeze contract: re-basing the reference is a new monitor
    (or a rebuilt sidecar), never an in-place mutation, because
    per-batch rows scored against shifting cutpoints are incomparable
    — and ENFORCED: a restart recomputes the sidecar from the passed
    reference and refuses loudly if it differs from the frozen one
    (both are bucket-count-sized, so the equality check is free).

    Per batch: ONE fold of the batch's values into ≤ n_buckets count
    rows (map-side combined; the only stage that sees the batch's
    rows), written to ``out_path`` partitioned by ``_commit_id`` with
    dynamic partition overwrite — a crash-replayed batch rewrites
    exactly its own partition (the shared replay mechanism; no marker
    needed because counts are partition-decomposable, unlike the
    inverted index's stats merge).  The monitor log is
    bucket-count-sized per batch regardless of batch volume.  Read it
    with :func:`drift_report`, whose per-batch PSI is bit-equal to the
    batch operator run on the same slice (pinned in tests).

    ``by`` turns the monitor SEGMENTED — the streaming face of
    :func:`...operators.audit.population_stability_index_by`,
    completing the drift story's symmetry the way ``rrf_fuse_grouped``
    completed retrieval's: each segment freezes its OWN cutpoints in
    the ``_ref`` sidecar (one grouped percentile aggregate), every
    batch folds to ≤ |segments| x n_buckets count rows keyed on the
    segment columns, and :func:`drift_report` discovers the
    segmentation from the sidecar's columns (self-describing — no
    ``by`` re-stated at read time) and reports per (batch, segment,
    bucket), per-segment bit-equal to the batch segmented operator on
    the same slice (pinned in tests).  Segment cardinality must be
    dimension-sized (the batch operator's contract); batch rows whose
    segment has no frozen cutpoints drop out of the fold — a NEW
    segment appearing mid-stream is a re-base event (new monitor),
    exactly like a changed reference.  NULL segment keys are not
    scored (equi-join), NULL values are excluded, matching the batch
    operator.  Returns the started StreamingQuery."""
    from airflow_etl_minio_to_postgres_spark.operators.audit import (
        psi_bucket_counts,
        psi_ref_cuts,
    )
    from airflow_etl_minio_to_postgres_spark.sources.manifest import (
        resolve_data_root,
    )

    gcols = list(by or [])
    # manifest-aware (and scheme-agnostic — the whole monitor family
    # goes through Spark/Hadoop IO): after a compact_drift_log commit
    # the _ref sidecar and the count log live under the current
    # generation; a never-compacted monitor resolves to the root
    out_local = resolve_data_root(ref.sparkSession, out_path)
    token = _commit_token(checkpoint_path)
    r = ref.select(*gcols, F.col(value_col).alias("_v")).where(
        F.col("_v").isNotNull()
    )
    cuts = psi_ref_cuts(r, n_buckets, group_cols=gcols or None)
    counts = psi_bucket_counts(r, cuts, "_rc", group_cols=gcols or None)
    if gcols:
        sidecar = counts.join(F.broadcast(cuts), gcols)
    else:
        sidecar = counts.crossJoin(F.broadcast(cuts))
    sidecar = sidecar.withColumn("n_buckets", F.lit(int(n_buckets)))
    spark = ref.sparkSession
    ref_path = os.path.join(out_local, "_ref")
    if _fs_exists(spark, ref_path):
        # a restart must present the SAME frozen reference: silently
        # re-basing cutpoints makes every already-logged batch
        # incomparable with every future one (the silver legacy-layout
        # guard posture — fail loudly, never re-base in place).  The
        # sidecar is bucket-count-sized (x |segments| when segmented,
        # dimension-sized by contract), so the full compare is free.
        old = sorted(
            tuple(t) for t in spark.read.parquet(ref_path).collect()
        )
        new = sorted(tuple(t) for t in sidecar.collect())
        if old != new:
            raise ValueError(
                f"streaming_drift_monitor: the reference sidecar at "
                f"{ref_path!r} was frozen from a DIFFERENT reference "
                "than the one passed now — per-batch PSI rows scored "
                "against shifting cutpoints are incomparable.  Pass "
                "the original reference, or re-base deliberately with "
                "a fresh out_path (a new monitor)"
            )
    else:
        sidecar.coalesce(1).write.mode("overwrite").parquet(ref_path)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        _drift_process_batch(
            batch_df, batch_id, out_local, token, value_col, by=gcols
        )

    return (
        raw_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def _drift_process_batch(
    batch_df: DataFrame,
    batch_id: int,
    out_path: str,
    token: str,
    value_col: str,
    by: list[str] | None = None,
) -> None:
    """One :func:`streaming_drift_monitor` micro-batch — module-level so
    the replay contract (same batch twice == once) is directly
    testable, like the other foreachBatch sinks.  With ``by`` the
    batch folds per (segment, bucket) against each segment's own
    frozen cutpoints (one grouped fold, still ≤ |segments| x n_buckets
    rows out)."""
    from airflow_etl_minio_to_postgres_spark.operators.audit import (
        psi_bucket_counts,
    )

    from airflow_etl_minio_to_postgres_spark.sources.manifest import (
        resolve_data_root,
    )

    gcols = list(by or [])
    spark = batch_df.sparkSession
    # identity for a pre-resolved generation path; resolves the current
    # generation when handed the monitor root (the replay tests do)
    out_path = resolve_data_root(spark, out_path)
    ref = spark.read.parquet(os.path.join(out_path, "_ref"))
    if gcols:
        cuts = ref.select(*gcols, "_cuts").dropDuplicates(gcols)
    else:
        cuts = ref.select("_cuts").limit(1)
    c = batch_df.select(*gcols, F.col(value_col).alias("_v")).where(
        F.col("_v").isNotNull()
    )
    counts = (
        psi_bucket_counts(c, cuts, "_cc", group_cols=gcols or None)
        .withColumn("_batch_id", F.lit(int(batch_id)))
        .withColumn("_commit_id", F.lit(f"{token}-{batch_id}"))
    )
    (
        counts.coalesce(1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("_commit_id")
        .parquet(out_path)
    )


def compact_drift_log(
    spark: SparkSession,
    out_path: str,
    compact_seq: int = 0,
    keep_last: int = 1,
) -> int:
    """Housekeeping for a :func:`streaming_drift_monitor` log: fold the
    one-tiny-file-per-batch ``_commit_id`` partitions into ONE
    ``compact-<seq>`` commit — the drift-log face of
    :func:`compact_ivf_index`.  Every row keeps its ``_batch_id``
    DATA column, so :func:`drift_report` is bit-equal before and after
    (pinned in tests); the ``_ref`` sidecar rides INTO the published
    generation (a generic ``compact_parquet`` over the root would
    flatten the ``_commit_id`` layout AND drop the sidecar — this is
    why the log has its own compactor).  Same run-window contract as
    the other compactors: only between cleanly-terminated runs,
    because a pending replay's dynamic overwrite would duplicate
    rather than replace rows folded into the compact commit.

    OBJECT-STORE CAPABLE — the manifest protocol's third adopter
    (``sources/manifest.py``; the ``compact_inverted_index`` sidecar
    recipe: copy ``_ref`` into the ``_gen-<seq>`` prefix, publish the
    manifest, GC the superseded root sidecar).  The monitor, the
    per-batch sink, and :func:`drift_report` all resolve the current
    generation per call; ``keep_last`` is the GC grace window.
    Idempotent in content.  Returns the log row count."""
    from airflow_etl_minio_to_postgres_spark.sources.manifest import (
        _join,
        copy_tree,
        gc_generations,
        next_seq,
        publish_generation,
        resolve_data_root,
    )

    data_root = resolve_data_root(spark, out_path)
    df = spark.read.parquet(data_root)
    if "_batch_id" not in df.columns or "_commit_id" not in df.columns:
        raise ValueError(
            f"compact_drift_log: {out_path!r} has columns "
            f"{sorted(df.columns)} — not a streaming_drift_monitor log"
        )
    data_cols = [c for c in df.columns if c != "_commit_id"]
    compacted = (
        df.select(*data_cols)
        .withColumn("_commit_id", F.lit(f"compact-{int(compact_seq)}"))
        .coalesce(1)
    )
    seq = next_seq(spark, out_path)
    gen = f"_gen-{seq:06d}"
    (
        compacted.write.mode("overwrite")
        .partitionBy("_commit_id")
        .parquet(_join(out_path, gen))
    )
    # the frozen reference rides INTO the generation the manifest flips
    copy_tree(
        spark, _join(data_root, "_ref"), _join(out_path, gen, "_ref")
    )
    publish_generation(spark, out_path, seq, gen)
    gc_generations(
        spark, out_path, seq, gen, legacy_sidecars=("_ref",),
        keep_last=keep_last,
    )
    return spark.read.parquet(_join(out_path, gen)).count()


def drift_report(
    spark: SparkSession, out_path: str, cumulative: bool = False
) -> DataFrame:
    """Per-batch PSI report over a :func:`streaming_drift_monitor` log:
    one row per (batch, bucket) with the exact
    :func:`...operators.audit.psi_parts` columns plus ``_batch_id`` —
    sum ``psi_part`` within a batch for its total PSI.  Bit-equal to
    running the batch operator on each batch's slice (the sidecar holds
    the frozen reference counts; ``psi_parts`` is shared verbatim).
    Cost: the log and sidecar are bucket-count-sized — |batches| x
    n_buckets rows, metadata-scale at any corpus size.

    ``cumulative=True`` answers the companion question — "has
    EVERYTHING ingested so far drifted?" — by prefix-summing the
    logged counts per bucket over the batch order (counts are
    additive, so batch b's row is exactly the batch operator run on
    the union of slices 0..b; pinned in tests).  One running-sum
    window over the bucket-count-sized log, same cost class.

    A SEGMENTED monitor's log (``streaming_drift_monitor(by=...)``) is
    detected from the sidecar's columns — the report needs no ``by``
    restated: rows come back per (batch, segment, bucket), bit-equal
    per segment to ``population_stability_index_by`` on the same slice
    (pinned in tests), and the cumulative window runs per (segment,
    bucket) cell."""
    from airflow_etl_minio_to_postgres_spark.operators.audit import (
        psi_parts,
    )
    from airflow_etl_minio_to_postgres_spark.sources.manifest import (
        resolve_data_root,
    )

    out_local = resolve_data_root(spark, out_path)
    jvm = spark.sparkContext._jvm
    gp = jvm.org.apache.hadoop.fs.Path(
        os.path.join(out_local, "_commit_id=*", "*")
    )
    fs = gp.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    matches = fs.globStatus(gp)
    if matches is None or len(matches) == 0:
        # a sidecar-only directory would otherwise fail schema
        # inference with an error pointing nowhere near the cause
        raise ValueError(
            f"drift_report: no batches logged at {out_path!r} yet "
            "(only the _ref sidecar exists) — run the monitor over "
            "at least one non-empty micro-batch first"
        )
    ref = spark.read.parquet(os.path.join(out_local, "_ref"))
    gcols = [
        c
        for c in ref.columns
        if c not in ("bucket", "_rc", "_cuts", "n_buckets")
    ]
    rc = ref.select(*gcols, "bucket", "_rc")
    log = spark.read.parquet(out_local).select(
        "_batch_id", *gcols, "bucket", "_cc"
    )
    batches = log.select("_batch_id").distinct()
    cell_keys = gcols + ["bucket"]
    if cumulative:
        from pyspark.sql import Window

        # densify to the (batch x logged-cell) grid so the running
        # sum carries a cell forward through batches that missed it,
        # then keep only rows whose prefix sum is non-zero — exactly
        # the row set the batch operator produces on the union slice
        cells = log.select(*cell_keys).distinct()
        dense = (
            batches.crossJoin(cells)
            .join(log, ["_batch_id", *cell_keys], "left")
            .select(
                "_batch_id",
                *cell_keys,
                F.coalesce(F.col("_cc"), F.lit(0)).alias("_cc"),
            )
        )
        w = (
            Window.partitionBy(*cell_keys)
            .orderBy("_batch_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        log = dense.select(
            "_batch_id",
            *cell_keys,
            F.sum("_cc").over(w).alias("_cc"),
        ).where(F.col("_cc") > 0)
    # the frozen reference counts, replicated per observed batch —
    # ONE grouped psi_parts plan regardless of how many batches the
    # monitor has logged (both frames are |batches| x |segments| x
    # n_buckets rows)
    rc_per_batch = batches.crossJoin(F.broadcast(rc))
    return psi_parts(
        rc_per_batch, log, eps=1e-6, group_cols=["_batch_id", *gcols]
    )
