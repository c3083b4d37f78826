"""Incremental table-to-table sync off the change data feed — the
derived-table ("bronze -> silver") half of the CDC loop.

``sync_table(src, dst, transform)`` reads ``src.changes_since(cursor)``
— O(changed buckets), never a table scan — pushes the rows through a
1:1 row-wise transform, and MERGEs them into ``dst``. The cursor is
not a sidecar file: it is encoded in the destination's own
applied-epoch set (epoch id ``sync-v<N>`` = "synced through source
version N"), so exactly-once falls out of the sink's idempotent MERGE:
a crashed or repeated sync of the same source range is a no-op, and
resume-after-restart needs no extra state. This recasts the
reference's whole-pipeline re-run model (Julius chains recompute every
intermediate RTable, /root/reference/src/Etl/Julius.hs) as
incremental view maintenance over the lake.

Scale: per sync the work is one bucket-pruned CDF read + one MERGE of
the change rows — O(changes), not O(table). Retention contract: the
cursor must stay within the source's snapshot retention window
(``expire_snapshots``); an expired cursor raises instead of silently
skipping changes.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, functions as F

from .table import SYNC_EPOCH_PREFIX, LakeError, LakeTable

# single source of truth lives in table.py: _commit's epoch-retention
# pruning pins the newest entry with this prefix (the cursor)
SYNC_PREFIX = SYNC_EPOCH_PREFIX


def sync_cursor(dst: LakeTable) -> int:
    """The source version ``dst`` has been synced through (0 = never)."""
    return max(
        (
            int(e[len(SYNC_PREFIX):])
            for e in dst.applied_epochs()
            # join_view cursors share the retention-exempt "sync-v"
            # prefix but carry a non-numeric suffix ("sync-vj-a3-b5");
            # they are not OUR cursor — skip, don't crash
            if e.startswith(SYNC_PREFIX) and e[len(SYNC_PREFIX):].isdigit()
        ),
        default=0,
    )


def sync_table(
    src: LakeTable,
    dst: LakeTable,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    *,
    mode: str = "cow",
) -> dict:
    """Advance ``dst`` to reflect ``src``'s current snapshot.

    ``transform`` is a 1:1 row-wise mapping over the change feed: it
    may rename/derive/retype PAYLOAD columns but must preserve
    ``dst.key_cols`` and the ``_change_type``/``_commit_version``
    metadata columns, and must not filter or duplicate rows (a dropped
    update would leave ``dst`` permanently stale for that key — use a
    downstream query for filtering semantics).

    Multi-commit catch-up is safe in ONE merge: a key touched in
    several source commits is LWW-deduped on ``_commit_version``
    (latest source commit wins — exactly replay order), and a delete
    in the last touching commit propagates as a delete.
    """
    cursor = sync_cursor(dst)
    target = src.version
    if cursor > target:
        raise LakeError(
            f"sync_table: cursor {cursor} is ahead of source version "
            f"{target} (source rolled back or wrong table?)"
        )
    if cursor == target:
        return {"synced_from": cursor, "synced_to": target, "skipped": True}

    feed = src.changes_since(cursor)
    if transform is not None:
        feed = transform(feed)
        missing = [
            c
            for c in [*dst.key_cols, "_change_type", "_commit_version"]
            if c not in feed.columns
        ]
        if missing:
            raise LakeError(
                f"sync_table: transform dropped required columns {missing}"
            )
    batch = feed.withColumn(
        "op",
        F.when(F.col("_change_type") == "D", F.lit("D")).otherwise(
            F.lit("U")
        ),
    ).drop("_change_type")
    stats = dst.merge(
        batch,
        epoch_id=f"{SYNC_PREFIX}{target}",
        op_col="op",
        order_cols=("_commit_version",),
        drop_cols=("_commit_version",),
        mode=mode,
    )
    return {
        "synced_from": cursor,
        "synced_to": target,
        "skipped": stats.skipped,
        "stats": stats,
    }


def stream_sync_table(
    spark,
    src_root: str,
    dst: LakeTable,
    *,
    checkpoint: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    mode: str = "cow",
    starting_version: int = 0,
    available_now: bool = True,
    processing_time: str | None = None,
    via: str = "merge",
):
    """Continuously maintained replica: the ``lake_cdf`` STREAMING
    source feeding an idempotent MERGE sink via foreachBatch — the
    always-on form of :func:`sync_table`.

    ``via="sink"`` swaps the foreachBatch MERGE for the
    ``format("lake")`` DataSource sink: the whole replica is then one
    declarative pipeline — ``readStream.format("lake_cdf")`` →
    ``writeStream.format("lake")`` — with zero driver-side user code
    per batch. Each micro-batch lands as an O(batch) MoR delta append
    (run ``compact_deltas()`` periodically on the replica); correct
    without any dedup because a CDF window is a NET per-key diff and
    the sink's commit order follows source commit order. The sink's
    table guards apply (no generated/default/constraint/lineage
    destinations); ``mode`` is ignored on this path.

    The cursor is Spark's own streaming checkpoint (offsets are source
    snapshot versions), and exactly-once composes from both ends: a
    crashed micro-batch replays with the same ``batch_id``, whose
    epoch id the destination has already applied — a no-op. The
    default ``starting_version=0`` bootstraps the replica from the
    source's empty create snapshot (the first micro-batch's net diff
    IS the full state, delivered one partition per bucket); point it
    at a later version to replicate forward-only.

    Each micro-batch window is a NET per-key diff (one row per key),
    so the MERGE needs no intra-batch ordering. ``transform`` follows
    the ``sync_table`` contract: 1:1 row-wise over payload columns,
    never filtering, preserving ``dst.key_cols`` + ``_change_type``.

    ``available_now=True`` drains to the current head and stops (the
    cron-shaped deployment; rerun to catch up); pass
    ``available_now=False`` with a ``processing_time`` trigger for an
    always-on replica. Returns the StreamingQuery."""
    from ..streaming.cdf_source import read_cdf_stream

    # Replica rename tracking (round 5): the lake_cdf source serves a
    # rename-crossing window under the stream's negotiated names, and
    # a fresh readStream (this call) negotiates the source's CURRENT
    # names — so a replica whose source renamed a column since the
    # last sync must apply the same rename first, or the merge would
    # schema-EVOLVE the new name in next to the stale old column
    # (changes_segmented's consumer contract, automated: its rename
    # markers say exactly "apply o -> n to the sink"). Old names are
    # tombstoned at the source (never reused), so presence of the OLD
    # name in dst + absence of the NEW one identifies exactly the
    # pending renames, idempotently, regardless of the cursor.
    src_head = LakeTable.load(spark, src_root)
    src_names = set(src_head.schema.names)
    recs = sorted(
        src_head.manifest.get("renamed_columns", []),
        key=lambda r: int(r["version"]),
    )
    for d in list(dst.schema.names):
        term = d
        for r in recs:  # forward-map through rename chains (a->b->c)
            if r["old"] == term:
                term = r["new"]
        if (
            term != d
            and term in src_names
            and term not in dst.schema.names
        ):
            dst.rename_column(d, term)

    feed = read_cdf_stream(
        spark, src_root, starting_version=starting_version
    )

    if via == "sink":
        from ..streaming.lake_sink import (
            prepare_sink_frame, write_lake_stream,
        )

        f = feed
        if transform is not None:
            f = transform(f)
            missing = [
                c
                for c in [*dst.key_cols, "_change_type"]
                if c not in f.columns
            ]
            if missing:
                raise LakeError(
                    "stream_sync_table: transform dropped required "
                    f"columns {missing}"
                )
        b = f.withColumn(
            "op",
            F.when(F.col("_change_type") == "D", F.lit("D")).otherwise(
                F.lit("U")
            ),
        ).drop("_change_type")
        trigger = (
            {"availableNow": True}
            if available_now
            else (
                {"processingTime": processing_time}
                if processing_time is not None
                else None
            )
        )
        return write_lake_stream(
            prepare_sink_frame(dst, b, op_col="op"),
            dst.root, checkpoint=checkpoint, dedup="none",
            epoch_prefix=f"{SYNC_PREFIX}cdf", trigger=trigger,
        )
    if via != "merge":
        raise LakeError(f"stream_sync_table: unknown via={via!r}")

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if transform is not None:
            batch = transform(batch)
            missing = [
                c
                for c in [*dst.key_cols, "_change_type"]
                if c not in batch.columns
            ]
            if missing:
                raise LakeError(
                    "stream_sync_table: transform dropped required "
                    f"columns {missing}"
                )
        b = batch.withColumn(
            "op",
            F.when(F.col("_change_type") == "D", F.lit("D")).otherwise(
                F.lit("U")
            ),
        ).drop("_change_type")
        dst.merge(
            b,
            epoch_id=f"{SYNC_PREFIX}cdf-{batch_id}",
            op_col="op",
            order_cols=(),
            mode=mode,
        )

    w = feed.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        w = w.trigger(availableNow=True)
    elif processing_time is not None:
        w = w.trigger(processingTime=processing_time)
    return w.start()
