"""Structured-Streaming skin over the CDC apply loop.

The reference is batch-only (SURVEY.md §2.10); the north rule's
"binlog/WAL tail" is a change-event *file* feed tailed continuously.
This module runs the exact same epoch-apply (`LakeTable.merge`) under
`readStream` + `foreachBatch`: each micro-batch is one commit epoch.

Exactly-once comes from two independent layers:
- Spark's streaming checkpoint (offset log) replays a failed batch with
  the same ``batch_id``;
- the lake manifest records ``stream-{batch_id}`` as an applied epoch,
  so a replayed batch is a no-op MERGE (idempotent sink — the same
  contract Iceberg's ``commit.retry`` + snapshot-id check gives).

Late/duplicate events inside a batch collapse via the merge's
last-writer-wins dedup on (ts, seq); late events across batches are
harmless because MERGE is state-convergent: an older (ts, seq) arriving
after a newer one loses inside its own batch's dedup, and would need a
``matched_filter`` on ts to also lose against already-applied state —
which ``lww_matched_filter`` provides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..lake.table import LakeTable


def lww_matched_filter(order_col: str = "ts") -> Column:
    """Matched rows only update when the source is not older than the
    target (cross-batch last-writer-wins for out-of-order feeds)."""
    return F.col(f"t.{order_col}") <= F.col(f"s.{order_col}")


def tail_feed_dir(
    spark: SparkSession,
    table: LakeTable,
    feed_dir: str,
    *,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    op_col: str = "op",
    order_cols: tuple = ("ts", "seq"),
    cross_batch_lww: bool = False,
):
    """Tail a directory of change-event parquet files into the table.

    Returns the started StreamingQuery. ``available_now=True`` drains
    everything currently in the directory then stops (bounded test /
    catch-up mode); False tails forever (the production WAL tail).
    """
    reader = spark.readStream.schema(
        spark.read.parquet(feed_dir).schema
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(feed_dir)

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        table.merge(
            batch,
            epoch_id=f"stream-{batch_id:08d}",
            op_col=op_col,
            order_cols=order_cols,
            matched_filter=(
                lww_matched_filter(order_cols[0]) if cross_batch_lww else None
            ),
        )

    writer = stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation",
        checkpoint_dir or f"{table.root}/_stream_checkpoint",
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
