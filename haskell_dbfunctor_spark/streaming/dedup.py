"""Streaming exactly-once event dedup — ``dropDuplicatesWithinWatermark``.

A WAL tail sees re-delivered events (at-least-once sources re-send on
reconnect); the lake MERGE is idempotent per epoch, but a stream that
feeds per-event consumers (metrics, alerting) needs row-level dedup
with BOUNDED state. The reference has no streaming surface at all (its
tables are complete in-memory values — /root/reference/src/RTable/
Core.hs:205-260); this is the Spark-native recast: keyed dedup state
kept only within the watermark horizon, evicted beyond it.

Contract (measured on this Spark, pinned by
tests/test_streaming_dedup.py):
- a duplicate key arriving while the first occurrence's event time is
  still >= the watermark is DROPPED by dedup state (exactly-once
  within the horizon), across micro-batches;
- a VERBATIM re-delivery (same event time — the WAL case) arriving
  after the watermark evicted its key's state is dropped anyway, by
  the stateful operator's late-row filter: eviction implies
  watermark > event time, which makes the re-delivery late. Verbatim
  re-delivery is therefore exactly-once under ANY timing;
- what eviction DOES lose is key-level dedup of *distinct* events: a
  new event with the same key but a fresh event time past the horizon
  is emitted again — size the watermark above the window in which a
  logical key may legitimately recur (the analog of the lake's
  ``epochs.retention-count`` contract).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F, types as T


def dedup_within_watermark(
    stream: DataFrame,
    key_cols: Sequence[str],
    *,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Row-level streaming dedup on ``key_cols`` with state bounded by
    ``watermark`` on ``ts_col``. Unlike plain ``dropDuplicates`` on a
    stream (whose state grows without bound), state for a key is
    dropped once the watermark passes its event time."""
    return stream.withWatermark(ts_col, watermark) \
        .dropDuplicatesWithinWatermark(list(key_cols))


def drain_dedup_stream(
    spark,
    feed_dir: str,
    schema: T.StructType,
    out_dir: str,
    key_cols: Sequence[str],
    *,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    timeout_s: int = 600,
) -> DataFrame:
    """AvailableNow drain of a file feed through
    :func:`dedup_within_watermark` (append mode — dedup emits each
    surviving row exactly once); returns the emitted rows."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(feed_dir)
    deduped = dedup_within_watermark(
        stream, key_cols, ts_col=ts_col, watermark=watermark
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        batch.write.mode("append").parquet(out_dir)

    q = (
        deduped.writeStream.outputMode("append")
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
