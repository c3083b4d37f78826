"""Event-time windowed aggregation with watermarks — late data on a
stream.

The reference aggregates only complete in-memory tables; a WAL tail
needs event-time windows whose state can be EVICTED once the watermark
passes (bounded state on an unbounded feed) and a policy for late
events: within the watermark they merge into their window, beyond it
they are dropped.

``windowed_stats`` builds the tumbling-window aggregate;
``drain_windowed_stats`` runs an availableNow drain. In "complete"
mode every trigger rewrites the full result (the final rewrite is the
answer — oracle-checkable against a batch GROUP BY); in "update" mode
emissions are per-batch and watermark eviction is live — the mode the
late-data tests exercise.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F, types as T


def windowed_stats(
    stream: DataFrame,
    *,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("event_type",),
    window: str = "10 minutes",
    watermark: str = "0 seconds",
    value_col: str | None = "value",
) -> DataFrame:
    """Tumbling event-time window counts (+ value sum) per key.

    ``watermark`` bounds how late an event may arrive and still merge
    into its window; state older than (max event time - watermark) is
    evicted. Output flattens the window struct to ``window_start``.
    """
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), *key_cols)
        .agg(*aggs)
        .select(
            F.col("window.start").alias("window_start"),
            *key_cols,
            "n_events",
            *(["sum_value"] if value_col else []),
        )
    )


def session_windowed_stats(
    stream: DataFrame,
    *,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("user_id",),
    gap: str = "30 minutes",
    watermark: str = "0 seconds",
    value_col: str | None = "value",
) -> DataFrame:
    """Event-time SESSION windows per key: a session extends while
    consecutive events are < ``gap`` apart; ``session_end`` is the last
    event's time + gap (Spark ``session_window`` semantics — matches
    the batch islands formulation ``max(ts) + gap``).

    Streaming support (probed on this Spark): output modes complete
    and append; update is rejected by the planner (sessions MERGE
    across batches, so a keyed per-row update stream cannot represent
    a merge that retires two previously-emitted rows). In append mode
    only sessions CLOSED by the watermark are ever emitted — a
    trailing still-open session is withheld, which is the bounded-state
    contract a 10^10-event tail needs; complete mode retains all state
    and its final rewrite equals the batch answer.
    """
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), *key_cols)
        .agg(*aggs)
        .select(
            *key_cols,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            *(["sum_value"] if value_col else []),
        )
    )


def drain_session_windows(
    spark,
    feed_dir: str,
    schema: T.StructType,
    out_dir: str,
    *,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("user_id",),
    gap: str = "30 minutes",
    watermark: str = "0 seconds",
    value_col: str | None = "value",
    mode: str = "complete",
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    timeout_s: int = 600,
) -> DataFrame:
    """AvailableNow drain of a file feed through
    ``session_windowed_stats``. mode="complete": every trigger
    overwrites ``out_dir`` with the full merged-session result; the
    final rewrite is returned (oracle-checkable against a batch
    gaps-and-islands GROUP BY). mode="append": emissions are
    watermark-CLOSED sessions only; returns them as-is (each session
    is emitted exactly once — no reconstruction needed)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(feed_dir)
    agg = session_windowed_stats(
        stream, ts_col=ts_col, key_cols=key_cols, gap=gap,
        watermark=watermark, value_col=value_col,
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        if mode == "complete":
            batch.write.mode("overwrite").parquet(out_dir)
        else:
            batch.write.mode("append").parquet(out_dir)

    q = (
        agg.writeStream.outputMode(mode)
        .foreachBatch(sink)
        .option(
            "checkpointLocation", checkpoint_dir or f"{out_dir}_checkpoint"
        )
        .trigger(availableNow=True)
        .start()
    )
    from .tailer import await_or_raise

    await_or_raise(q, timeout_s)
    return spark.read.parquet(out_dir)


def drain_windowed_stats(
    spark,
    feed_dir: str,
    schema: T.StructType,
    out_dir: str,
    *,
    ts_col: str = "ts",
    key_cols: Sequence[str] = ("event_type",),
    window: str = "10 minutes",
    watermark: str = "0 seconds",
    value_col: str | None = "value",
    mode: str = "complete",
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    timeout_s: int = 600,
) -> DataFrame:
    """AvailableNow drain of a file feed through ``windowed_stats``.

    mode="complete": every trigger overwrites ``out_dir`` with the full
    windowed result; returns the final rewrite. mode="update": per-batch
    emissions append with their batch id (watermark eviction applies);
    returns the LAST emission per (window_start, key).
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(feed_dir)
    agg = windowed_stats(
        stream, ts_col=ts_col, key_cols=key_cols, window=window,
        watermark=watermark, value_col=value_col,
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        if mode == "complete":
            batch.write.mode("overwrite").parquet(out_dir)
        else:
            (
                batch.withColumn("__batch_id", F.lit(batch_id))
                .write.mode("append")
                .parquet(out_dir)
            )

    q = (
        agg.writeStream.outputMode(mode)
        .foreachBatch(sink)
        .option(
            "checkpointLocation", checkpoint_dir or f"{out_dir}_checkpoint"
        )
        .trigger(availableNow=True)
        .start()
    )
    from .tailer import await_or_raise

    await_or_raise(q, timeout_s)
    out = spark.read.parquet(out_dir)
    if mode == "complete":
        return out
    keys = ["window_start", *key_cols]
    vals = ["n_events"] + (["sum_value"] if value_col else [])
    last = out.groupBy(*keys).agg(
        F.max_by(F.struct(*vals), F.col("__batch_id")).alias("w")
    )
    return last.select(*keys, *[F.col(f"w.{v}").alias(v) for v in vals])
