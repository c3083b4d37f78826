"""Streaming dedup (dropDuplicatesWithinWatermark) semantics, pinned
empirically — the exactly-once-under-re-delivery contract q111 and the
WAL tail rely on. See haskell_dbfunctor_spark/streaming/dedup.py for
the full contract statement."""

from __future__ import annotations

import datetime as dt
import time

from pyspark.sql import types as T

from haskell_dbfunctor_spark.streaming.dedup import drain_dedup_stream

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("v", T.DoubleType()),
    ]
)


def _ts(h: int, m: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, h, m, 0)


def _write_segs(spark, tmp_path, *segs):
    root = str(tmp_path / "feed")
    for i, rows in enumerate(segs):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            f"{root}/seg{i}"
        )
        time.sleep(0.05)
    return f"{root}/seg*"


def test_verbatim_redelivery_is_exactly_once_any_timing(spark, tmp_path):
    """A verbatim dup within the horizon dies to dedup STATE (key C);
    one past eviction dies to the LATE filter (key A: watermark after
    batch 0 is 02:50 > its 00:00 event time, so its state is gone AND
    the re-delivery is late). Either way: exactly once."""
    feed = _write_segs(
        spark, tmp_path,
        [("A", _ts(0, 0), 1.0), ("B", _ts(3, 0), 2.0),
         ("C", _ts(2, 55), 9.0)],
        [("A", _ts(0, 0), 1.0),   # re-delivery after eviction
         ("C", _ts(2, 55), 9.0),  # re-delivery within horizon
         ("D", _ts(3, 5), 3.0)],
    )
    out = drain_dedup_stream(
        spark, feed, SCHEMA, str(tmp_path / "out"), ["k"],
        ts_col="ts", watermark="10 minutes",
        max_files_per_trigger=1,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    counts: dict[str, int] = {}
    for r in out.collect():
        counts[r.k] = counts.get(r.k, 0) + 1
    assert counts == {"A": 1, "B": 1, "C": 1, "D": 1}


def test_distinct_event_same_key_past_horizon_recurs(spark, tmp_path):
    """Eviction's real cost: a NEW event (fresh event time) reusing a
    key past the horizon is emitted again — key-level dedup only holds
    within the watermark window. Eviction applies at batch COMMIT with
    the batch's own watermark (derived from PRIOR batches — the same
    mechanics CLAUDE.md pins for windowed aggs), so the key recurs in
    the batch after the watermark-advancing one, not in it."""
    feed = _write_segs(
        spark, tmp_path,
        [("K", _ts(0, 0), 1.0)],
        [("W", _ts(3, 0), 0.0)],  # raises max event time
        # batch 2's wm (from batches 0-1) is 02:50; K's state (expires
        # 00:10) is evicted at THIS batch's commit
        [("X", _ts(3, 1), 0.0)],
        [("K", _ts(3, 5), 2.0)],  # same key, fresh ts, state gone
    )
    out = drain_dedup_stream(
        spark, feed, SCHEMA, str(tmp_path / "out"), ["k"],
        ts_col="ts", watermark="10 minutes",
        max_files_per_trigger=1,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    ks = sorted(r.k for r in out.collect())
    assert ks == ["K", "K", "W", "X"]


def test_same_key_within_horizon_deduped_across_batches(spark, tmp_path):
    """Within the horizon the SAME key dedups even when the second
    event's time differs (key-level semantics, not row-level)."""
    feed = _write_segs(
        spark, tmp_path,
        [("K", _ts(0, 0), 1.0)],
        [("K", _ts(0, 2), 2.0)],  # fresh ts but watermark still 0 - 1h
    )
    out = drain_dedup_stream(
        spark, feed, SCHEMA, str(tmp_path / "out"), ["k"],
        ts_col="ts", watermark="1 hour",
        max_files_per_trigger=1,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0].v == 1.0
