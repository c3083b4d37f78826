"""Stream-stream event-time interval join with watermark-bounded
state.

The reference joins only complete in-memory tables
(/root/reference/src/RTable/Core.hs:2704-2715 nested-loop theta
joins); joining two UNBOUNDED feeds (e.g. tool calls vs tool results,
impressions vs clicks) needs each side buffered in state only as long
as the other side's rows could still match: the join condition's time
interval plus the watermark. Spark derives the state-retention bound
from the interval condition itself — both sides must carry a
watermark, and matched pairs emit append-only once the watermark
guarantees no earlier match can arrive.

Semantics pinned by tests/test_streaming_joins.py (same batch-commit
mechanics as the windowed aggregations, CLAUDE.md): batch N's
watermark derives from batches < N; a buffered left row is evicted at
the commit of the batch whose watermark passes left_ts + upper +
watermark, after which a late matching right row produces NO pair.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F, types as T


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    keys: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    upper: str = "10 minutes",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Inner join: each left event pairs with right events of the same
    keys whose ``right_ts`` lies in [left_ts, left_ts + upper].

    ``left_ts`` and ``right_ts`` must be DIFFERENT column names (both
    survive into the output row); non-key right columns must not
    collide with left names. State on each side is bounded by
    upper + watermark — the 100 TB property: memory is a function of
    event-time skew between the feeds, never of feed length.
    """
    if left_ts == right_ts:
        raise ValueError(
            "interval_join: left_ts and right_ts must differ "
            "(both are kept in the output)"
        )
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = None
    for k in keys:
        eq = l[k] == r[k]
        cond = eq if cond is None else cond & eq
    cond = (
        cond
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.expr(f"l.{left_ts} + INTERVAL {upper}")
        )
    )
    drop_r_keys = [r[k] for k in keys]
    out = l.join(r, cond, "inner")
    for c in drop_r_keys:
        out = out.drop(c)
    return out


def drain_interval_join(
    spark,
    left_dir: str,
    left_schema: T.StructType,
    right_dir: str,
    right_schema: T.StructType,
    out_dir: str,
    *,
    keys: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "r_ts",
    upper: str = "10 minutes",
    watermark: str = "0 seconds",
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    timeout_s: int = 600,
) -> DataFrame:
    """AvailableNow drain of two file feeds through
    ``interval_join`` (append output — the only mode a stream-stream
    inner join supports). Returns the emitted pairs."""
    def reader(schema):
        rd = spark.readStream.schema(schema)
        if max_files_per_trigger:
            rd = rd.option("maxFilesPerTrigger", max_files_per_trigger)
        return rd

    joined = interval_join(
        reader(left_schema).parquet(left_dir),
        reader(right_schema).parquet(right_dir),
        keys=keys, left_ts=left_ts, right_ts=right_ts,
        upper=upper, watermark=watermark,
    )

    def sink(batch: DataFrame, batch_id: int) -> None:
        batch.write.mode("append").parquet(out_dir)

    q = (
        joined.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option(
            "checkpointLocation", checkpoint_dir or f"{out_dir}_checkpoint"
        )
        .trigger(availableNow=True)
        .start()
    )
    from .tailer import await_or_raise

    await_or_raise(q, timeout_s)
    import os

    if not os.path.isdir(out_dir):
        return spark.createDataFrame([], joined.schema)
    return spark.read.parquet(out_dir)
