"""Streaming session-window semantics, pinned empirically.

The reference has no streaming; the north rule's WAL tail needs
session windows whose state is bounded. What these tests pin (probed
on this Spark, then asserted so an upgrade that changes the contract
fails loudly):

- complete mode: sessions MERGE across micro-batches — two
  sub-sessions split by a segment boundary coalesce once the bridging
  event arrives; the final rewrite equals the batch answer.
- update mode: planner-REJECTED for session windows (a merge retires
  two previously-emitted rows, which a keyed update stream cannot
  express).
- append mode: only sessions CLOSED by the watermark are emitted; a
  trailing still-open session is withheld (bounded state at 10^10
  events — state for a key is dropped the moment its session closes).
"""

from __future__ import annotations

import datetime as dt
import time

import pytest
from pyspark.sql import functions as F, types as T

from haskell_dbfunctor_spark.streaming.windows import (
    drain_session_windows,
    session_windowed_stats,
)

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _ts(h: int, m: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, h, m, 0)


@pytest.fixture()
def feed(spark, tmp_path):
    """Two WAL segments with strictly increasing mtimes. u1's events
    straddle the segment boundary inside one 30-minute gap — the
    cross-batch merge case; u2 has one early closed session and one
    trailing session that stays open past every other event."""
    seg0 = [
        ("u1", _ts(0, 0), 1.0),
        ("u1", _ts(0, 5), 2.0),
        ("u2", _ts(1, 0), 3.0),
    ]
    seg1 = [
        ("u1", _ts(0, 8), 4.0),  # bridges u1's seg0 session
        ("u2", _ts(9, 0), 5.0),  # trailing, never watermark-closed
    ]
    root = str(tmp_path / "feed")
    spark.createDataFrame(seg0, SCHEMA).coalesce(1).write.parquet(
        f"{root}/seg0"
    )
    time.sleep(0.05)
    spark.createDataFrame(seg1, SCHEMA).coalesce(1).write.parquet(
        f"{root}/seg1"
    )
    return f"{root}/seg*"


def test_complete_mode_merges_sessions_across_batches(
    spark, feed, tmp_path
):
    out = drain_session_windows(
        spark, feed, SCHEMA, str(tmp_path / "out"),
        gap="30 minutes", watermark="0 seconds", mode="complete",
        max_files_per_trigger=1,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    rows = {
        (r.user_id, r.session_start, r.session_end, r.n_events, r.sum_value)
        for r in out.collect()
    }
    # u1: one MERGED session 00:00-00:38 (last event 00:08 + 30m), not
    # the two sub-sessions either single batch would produce
    assert (("u1", _ts(0, 0), _ts(0, 38), 3, 7.0)) in rows
    assert len([r for r in rows if r[0] == "u1"]) == 1
    # u2: both sessions present in complete mode (no eviction)
    assert (("u2", _ts(1, 0), _ts(1, 30), 1, 3.0)) in rows
    assert (("u2", _ts(9, 0), _ts(9, 30), 1, 5.0)) in rows


def test_complete_mode_equals_batch_session_window(spark, feed, tmp_path):
    streamed = drain_session_windows(
        spark, feed, SCHEMA, str(tmp_path / "out"),
        gap="30 minutes", watermark="0 seconds", mode="complete",
        max_files_per_trigger=1,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    batch = (
        spark.read.schema(SCHEMA).parquet(feed)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, batch.collect())
    )


def test_append_mode_withholds_watermark_open_sessions(
    spark, feed, tmp_path
):
    out = drain_session_windows(
        spark, feed, SCHEMA, str(tmp_path / "out"),
        gap="30 minutes", watermark="0 seconds", mode="append",
        max_files_per_trigger=1,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    rows = {(r.user_id, r.session_start) for r in out.collect()}
    # closed sessions emitted exactly once
    assert ("u1", _ts(0, 0)) in rows
    assert ("u2", _ts(1, 0)) in rows
    # the trailing session ends at 09:30 > final watermark (09:00) —
    # withheld: this IS the bounded-state eviction contract
    assert ("u2", _ts(9, 0)) not in rows
    assert out.count() == 2


def test_update_mode_rejected_for_session_windows(spark, feed, tmp_path):
    stream = spark.readStream.schema(SCHEMA).parquet(feed)
    agg = session_windowed_stats(
        stream, gap="30 minutes", watermark="0 seconds"
    )
    with pytest.raises(Exception, match="(?i)output mode|update"):
        q = (
            agg.writeStream.outputMode("update")
            .format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
