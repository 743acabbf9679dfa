"""Structured Streaming capability extension (SURVEY.md §2.10).

The reference has no streaming surface (its only extensibility hook,
DoAction, is Unimplemented — main.go:121-124); this package adds the
Spark-native streaming operators the corpus's ``events`` table implies:
tumbling/sliding/session windows, watermarks, stateful dedup.

Design: every transformation is written against a DataFrame, so the SAME
code runs in batch mode (oracle-checkable against DuckDB) and as a
Structured Streaming query (readStream → transform → writeStream). The
``run_stream_to_memory`` harness executes the streaming path with an
available-now trigger, which drains all input and stops — deterministic,
so even the streaming path hash-matches the batch oracle.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_server_spark.session import load_table


@contextmanager
def state_partitions(spark: SparkSession, n: int = 8):
    """Clamp ``spark.sql.shuffle.partitions`` while a streaming query starts.

    A stateful streaming query freezes the shuffle-partition count into its
    checkpoint as the state-store instance count at start; a session default
    sized for batch scans is pure state-store setup cost on a drained
    availableNow run (a stream-stream join opens 4 stores per partition —
    measured 6.3 s at 32 partitions vs 2.8 s at 8 on the test corpus). A
    production deployment sizes this to stream throughput per the
    checkpoint, not per session."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def tumbling_window(df: DataFrame, ts_col: str, width: str) -> DataFrame:
    """Tumbling event-time windows: groupBy(window(ts, width))."""
    return (
        df.groupBy(F.window(F.col(ts_col), width).alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "n_events",
            "sum_value",
        )
    )


def sliding_window(df: DataFrame, ts_col: str, width: str, slide: str) -> DataFrame:
    """Sliding windows: each event lands in width/slide overlapping windows."""
    return (
        df.groupBy(F.window(F.col(ts_col), width, slide).alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("win_start"), "n_events")
    )


def session_window(df: DataFrame, ts_col: str, key: str, gap: str) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge."""
    return (
        df.groupBy(F.col(key), F.session_window(F.col(ts_col), gap).alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col(key), F.col("win.start").alias("session_start"), "n_events")
    )


def stateful_dedup(df: DataFrame, keys: list[str]) -> DataFrame:
    """Dedup by key — dropDuplicates works identically on batch and stream
    (streaming keeps key state; add a watermark to bound it)."""
    return df.dropDuplicates(keys)


def read_events_stream(
    spark: SparkSession,
    sf_dir: str,
    with_watermark: str | None = "1 hour",
    single_file: bool = False,
) -> DataFrame:
    """File-source stream over the events table.

    The streaming file source requires a directory, so the parquet file is
    staged into a temp dir once per (session, sf_dir). The ns→µs timestamp
    normalization from load_table is preserved by staging the normalized
    batch frame. ``single_file=True`` coalesces the staging to one file so
    an availableNow run is exactly one micro-batch (deterministic update-
    mode output for oracle checks).
    """
    import hashlib

    suffix = "_1f" if single_file else ""
    # Stable digest: hash() is salted per process, which re-staged (and
    # leaked) a directory for every fresh process.
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    staged = os.path.join(
        tempfile.gettempdir(), f"dss_stream_events_{key}{suffix}"
    )
    marker = os.path.join(staged, "_SUCCESS")
    batch = load_table(spark, sf_dir, "events")
    if single_file:
        batch = batch.coalesce(1)
    if not os.path.exists(marker):
        batch.write.mode("overwrite").parquet(staged)
    stream = spark.readStream.schema(batch.schema).parquet(staged)
    if with_watermark:
        stream = stream.withWatermark("ts", with_watermark)
    return stream


def read_events_stream_time_ordered(
    spark: SparkSession,
    sf_dir: str,
    with_watermark: str | None = "1 hour",
    slices: int | None = None,
) -> DataFrame:
    """File-source stream over events staged as ONE FILE PER EVENT-TIME
    SLICE, drained one file per micro-batch (round 12, VERDICT r11 item
    3 — retiring the availableNow caveat in SCALING.md's r11s band).

    The plain staging writes parquet parts in arbitrary time order, so
    a multi-file drain would deliver late rows the watermark already
    passed and silently drop them — the reason r11 drained everything
    in ONE batch and could only *argue* that live-stream state stays
    bounded. Here each slice is written sequentially and stamped with a
    strictly increasing mtime (the file source orders by modification
    time), so ``maxFilesPerTrigger=1`` under availableNow replays the
    stream in event-time order: the watermark advances between
    micro-batches, join/agg state evicts progressively, and the
    per-batch PEAK state (last_stream_progress()['peak_state_rows'])
    measures what a live 100 TB/day stream would actually hold.

    ``slices=None`` derives the count from the data's time span at a
    FIXED ~5-day slice duration — a micro-batch covers constant wall
    time, so when the scaling band extends the time axis 10x/100x the
    slice count (micro-batch count) grows with it and per-batch volume
    stays flat, exactly a live stream's shape. A slice must be ONE
    file: two files of the same slice would drain as separate batches
    and the second could carry rows the watermark passed after the
    first. Staging is a single pass — repartition on the slice key
    makes each slice's rows one task, partitionBy makes them one file.
    """
    import hashlib

    batch = load_table(spark, sf_dir, "events")
    lo, hi = batch.agg(
        F.min(F.unix_timestamp("ts")), F.max(F.unix_timestamp("ts"))
    ).first()
    span = max(int(hi) - int(lo) + 1, 1)
    if slices is None:
        # round 13 (VERDICT r12 item 5): slice duration is tunable so
        # the scaling study can measure micro-batch overhead
        # amortization — same input, fatter slices, fewer triggers
        slice_days = float(os.environ.get("DSS_STREAM_SLICE_DAYS", "5"))
        slices = min(1024, max(2, round(span / (slice_days * 86400))))
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
    staged = os.path.join(
        tempfile.gettempdir(), f"dss_stream_events_{key}_to{slices}"
    )
    marker = os.path.join(staged, "_STAGED_OK")
    if not os.path.exists(marker):
        sliced = batch.withColumn(
            "__slice",
            F.least(
                F.lit(slices - 1),
                ((F.unix_timestamp("ts") - F.lit(int(lo)))
                 * slices / span).cast("int"),
            ),
        )
        if os.path.isdir(staged):
            shutil.rmtree(staged)
        tmp = staged + "_build"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        (sliced.repartition(slices, "__slice")
         .write.partitionBy("__slice").mode("overwrite").parquet(tmp))
        os.makedirs(staged)
        base_mtime = 1_000_000_000
        for k in range(slices):
            part_dir = os.path.join(tmp, f"__slice={k}")
            parts = (
                [f for f in sorted(os.listdir(part_dir))
                 if f.endswith(".parquet")]
                if os.path.isdir(part_dir) else []
            )
            if len(parts) != 1:
                raise RuntimeError(
                    f"time-ordered staging: slice {k} has {len(parts)} "
                    f"files (need exactly 1 for watermark correctness)"
                )
            dst = os.path.join(staged, f"slice{k:04d}.parquet")
            shutil.move(os.path.join(part_dir, parts[0]), dst)
            # deterministic, strictly increasing: the file source
            # orders by mtime, and same-second writes would tie
            os.utime(dst, (base_mtime + k, base_mtime + k))
        shutil.rmtree(tmp)
        with open(marker, "w") as fh:
            fh.write(str(slices))
    # partitionBy dropped __slice from the data files; serve the
    # original schema
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    if with_watermark:
        stream = stream.withWatermark("ts", with_watermark)
    return stream


def run_stream_to_memory(
    stream_df: DataFrame, output_mode: str = "complete"
) -> DataFrame:
    """Execute a streaming DataFrame with an available-now trigger into a
    memory sink; returns the drained result as a batch DataFrame.

    This is the micro-batch analog of the reference's finite DoGet result
    stream (main.go:241-243): process everything available, then stop.
    State-store partitioning is clamped via ``state_partitions`` for every
    streaming run routed through here.
    """
    name = f"dss_sink_{uuid.uuid4().hex[:12]}"
    with state_partitions(stream_df.sparkSession):
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    _capture_progress(q)
    return stream_df.sparkSession.table(name)


# metrics of the most recent drain: the 100 TB failure mode for
# streaming is UNBOUNDED STATE, not CPU — the scaling study (r11s band)
# and tests read this to assert the state store stays bounded by the
# watermark as input duration grows
_LAST_PROGRESS: dict = {}


def _capture_progress(q) -> None:
    state_rows = 0
    peak = 0
    batches = 0
    try:
        progresses = q.recentProgress or []
        batches = len(progresses)
        for pr in progresses:
            tot = sum(
                int(op.get("numRowsTotal", 0) or 0)
                for op in (pr.get("stateOperators", []) or [])
            )
            peak = max(peak, tot)
        lp = q.lastProgress or {}
        for op in lp.get("stateOperators", []) or []:
            state_rows += int(op.get("numRowsTotal", 0) or 0)
    except Exception:  # metrics are best-effort; never fail the drain
        return
    _LAST_PROGRESS.clear()
    _LAST_PROGRESS.update(
        {"state_rows": state_rows, "batches": batches,
         "peak_state_rows": peak}
    )


def last_stream_progress() -> dict:
    """State-store metrics of the most recent ``run_stream_to_memory``
    drain: {'state_rows': total rows held across stateful operators at
    the final micro-batch, 'batches': micro-batch count,
    'peak_state_rows': the max held at ANY micro-batch — the number a
    live unbounded stream's memory budget must cover (round 12; only
    meaningful with a multi-batch time-ordered drain)}."""
    return dict(_LAST_PROGRESS)
