"""Incremental table-to-table sync (lake/sync.py).

Invariant: after any sequence of syncs — one per source commit, one
batched catch-up, repeated/raced calls — the destination equals the
transform applied to the source's CURRENT state, and the cursor rides
the destination's own applied-epoch set (no sidecar state).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.lake.sync import sync_cursor, sync_table
from haskell_dbfunctor_spark.lake.table import LakeError, LakeTable

SRC_SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("txt", T.StringType()),
    T.StructField("n", T.LongType()),
    T.StructField("ts", T.TimestampType()),
])
DST_SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("txt_upper", T.StringType()),
    T.StructField("n2", T.LongType()),
])


def _batch(spark, rows, op="U"):
    """rows: (k, txt, n, seq)."""
    df = spark.createDataFrame(rows, "k long, txt string, n long, seq long")
    return df.select(
        "k", "txt", "n",
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("seq")).alias("ts"),
        F.lit(op).alias("op"), "seq",
    )


def _tf(feed):
    return feed.select(
        "k",
        F.upper("txt").alias("txt_upper"),
        (F.col("n") * 2).alias("n2"),
        "_change_type", "_commit_version",
    )


def _mk(spark, tmp_path):
    src = LakeTable.create(
        spark, str(tmp_path / "src"), SRC_SCHEMA, key_cols=["k"],
        num_buckets=4,
    )
    dst = LakeTable.create(
        spark, str(tmp_path / "dst"), DST_SCHEMA, key_cols=["k"],
        num_buckets=2,
    )
    return src, dst


def _expected(src):
    return sorted(
        (r["k"], (r["txt"] or "").upper() or None, r["n"] * 2 if r["n"] is not None else None)
        for r in src.read().collect()
    )


def _got(dst):
    return sorted(tuple(r) for r in dst.read().collect())


def test_sync_per_commit_tracks_source(spark, tmp_path):
    src, dst = _mk(spark, tmp_path)
    src.merge(_batch(spark, [(1, "a", 1, 1), (2, "b", 2, 1)]), epoch_id="e0")
    sync_table(src, dst, _tf)
    assert _got(dst) == [(1, "A", 2), (2, "B", 4)] == _expected(src)
    # update + insert
    src.merge(_batch(spark, [(1, "aa", 5, 2), (3, "c", 3, 2)]), epoch_id="e1")
    sync_table(src, dst, _tf)
    assert _got(dst) == _expected(src)
    # delete propagates
    src.merge(_batch(spark, [(2, "b", 2, 3)], op="D"), epoch_id="e2")
    res = sync_table(src, dst, _tf)
    assert not res["skipped"] and sync_cursor(dst) == src.version
    assert _got(dst) == _expected(src)
    assert all(k != 2 for k, *_ in _got(dst))


def test_batched_catchup_equals_per_commit(spark, tmp_path):
    """A key updated in several commits then deleted in the last one:
    one catch-up sync must land on the final state (LWW on
    _commit_version inside the single merge)."""
    src, dst = _mk(spark, tmp_path)
    src.merge(_batch(spark, [(1, "v1", 1, 1), (2, "x", 1, 1)]), epoch_id="e0")
    src.merge(_batch(spark, [(1, "v2", 2, 2)]), epoch_id="e1")
    src.merge(_batch(spark, [(1, "v3", 3, 3)]), epoch_id="e2")
    src.merge(_batch(spark, [(2, "x", 1, 4)], op="D"), epoch_id="e3")
    sync_table(src, dst, _tf)
    assert _got(dst) == [(1, "V3", 6)] == _expected(src)


def test_sync_idempotent_and_resumable(spark, tmp_path):
    src, dst = _mk(spark, tmp_path)
    src.merge(_batch(spark, [(1, "a", 1, 1)]), epoch_id="e0")
    sync_table(src, dst, _tf)
    again = sync_table(src, dst, _tf)
    assert again["skipped"]
    # a raced duplicate over the same range no-ops via epoch identity
    dst2 = LakeTable.load(spark, dst.root)
    assert sync_table(src, dst2, _tf)["skipped"]
    # new source commit -> resume picks up exactly the delta
    src.merge(_batch(spark, [(2, "b", 2, 2)]), epoch_id="e1")
    res = sync_table(src, dst2, _tf)
    assert res["synced_from"] == 1 and res["synced_to"] == 2
    assert _got(dst2) == _expected(src)


def test_transform_dropping_required_columns_raises(spark, tmp_path):
    src, dst = _mk(spark, tmp_path)
    src.merge(_batch(spark, [(1, "a", 1, 1)]), epoch_id="e0")
    with pytest.raises(LakeError):
        sync_table(src, dst, lambda f: f.drop("_commit_version").select(
            "k", F.upper("txt").alias("txt_upper"),
            (F.col("n") * 2).alias("n2"), "_change_type",
        ))


def test_cursor_ahead_of_source_raises(spark, tmp_path):
    src, dst = _mk(spark, tmp_path)
    src.merge(_batch(spark, [(1, "a", 1, 1)]), epoch_id="e0")
    sync_table(src, dst, _tf)
    src2 = LakeTable.load(spark, src.root, 0)  # rolled-back handle
    with pytest.raises(LakeError):
        sync_table(src2, dst, _tf)


def test_sync_in_mor_mode(spark, tmp_path):
    """sync_table(mode='mor'): the destination ingests the CDF as
    delta appends (no base rewrites after the first), state still
    tracks the source; compaction folds it unchanged."""
    src, dst = _mk(spark, tmp_path)
    src.merge(_batch(spark, [(1, "a", 1, 1), (2, "b", 2, 1)]), epoch_id="e0")
    sync_table(src, dst, _tf, mode="mor")
    src.merge(_batch(spark, [(1, "aa", 5, 2)]), epoch_id="e1")
    src.merge(_batch(spark, [(2, "b", 2, 3)], op="D"), epoch_id="e2")
    sync_table(src, dst, _tf, mode="mor")
    assert sum(len(f) for f in dst.manifest["delta_files"].values()) > 0
    assert _got(dst) == _expected(src) == [(1, "AA", 10)]
    dst.compact_deltas()
    assert _got(LakeTable.load(spark, dst.root)) == [(1, "AA", 10)]


def test_cursor_survives_epoch_retention(spark, tmp_path):
    """epochs.retention-count on a destination that also receives
    non-sync merges must NEVER prune the newest sync-v entry — pruning
    it regresses the cursor to 0 and the next sync re-walks the whole
    source history (or dies on expired source manifests)."""
    src, _ = _mk(spark, tmp_path)
    dst = LakeTable.create(
        spark, str(tmp_path / "dst2"), DST_SCHEMA, key_cols=["k"],
        num_buckets=2, properties={"epochs.retention-count": "3"},
    )
    src.merge(_batch(spark, [(1, "a", 1, 1), (2, "b", 2, 1)]), epoch_id="e0")
    sync_table(src, dst, _tf)
    cursor = sync_cursor(dst)
    assert cursor == src.version
    # flood the destination with non-sync merges well past retention
    for i in range(6):
        dst.merge(
            spark.createDataFrame(
                [(100 + i, "X", 0)], "k long, txt_upper string, n2 long"
            ).select(
                "k", "txt_upper", "n2",
                F.lit("U").alias("op"), F.lit(i).alias("seq"),
            ),
            epoch_id=f"noise-{i}",
        )
    fresh = LakeTable.load(spark, dst.root)
    assert sync_cursor(fresh) == cursor, "sync cursor pruned by retention"
    # and the next sync is incremental, not a full re-walk
    src.merge(_batch(spark, [(3, "c", 3, 2)]), epoch_id="e1")
    res = sync_table(src, fresh, _tf)
    assert res["synced_from"] == cursor and not res["skipped"]


def test_changes_since_expired_cursor_raises_lake_error(spark, tmp_path):
    """An expired cursor (manifest GC'd by expire_snapshots) must raise
    LakeError naming the window, not a raw FileNotFoundError."""
    src, _ = _mk(spark, tmp_path)
    for i in range(4):
        src.merge(_batch(spark, [(i, "x", i, i)]), epoch_id=f"e{i}")
    src.expire_snapshots(keep_last=2)
    with pytest.raises(LakeError, match="retained snapshot window"):
        src.changes_since(1).count()
