"""Incremental aggregate-view maintenance (lake/agg_view.py).

Invariant: after any refresh sequence, the view equals a full
``GROUP BY`` recompute over the source's CURRENT snapshot — inserts,
updates (including group migration), deletes (including deletes of the
stored min/max, which trigger exact dirty-group repair), NULL group
keys, and all-NULL sum columns included — with the cursor riding the
view's own applied-epoch set.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.lake.agg_view import (
    Max,
    Min,
    Sum,
    av_cursor,
    create_agg_view,
    sync_agg_view,
)
from haskell_dbfunctor_spark.lake.table import LakeError, LakeTable

SRC_SCHEMA = T.StructType([
    T.StructField("eid", T.LongType()),
    T.StructField("grp", T.StringType()),
    T.StructField("val", T.LongType()),
])

SPECS = [Sum("val", "v_sum"), Min("val", "v_min"), Max("val", "v_max")]


def _batch(spark, rows, op="U"):
    """rows: (eid, grp, val)."""
    return spark.createDataFrame(
        rows, "eid long, grp string, val long"
    ).withColumn("op", F.lit(op))


def _mk(spark, tmp_path, rows):
    src = LakeTable.create(
        spark, str(tmp_path / "src"), SRC_SCHEMA, key_cols=["eid"],
        num_buckets=4,
    )
    src.merge(_batch(spark, rows), epoch_id="e1",
              order_cols=("eid",), drop_cols=())
    view = create_agg_view(
        spark, str(tmp_path / "view"), src, ["grp"], SPECS, num_buckets=2,
    )
    return src, view


def _recompute(src):
    return src.read().groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("val").alias("v_sum"),
        F.count("val").cast("long").alias("v_sum_n"),
        F.min("val").alias("v_min"),
        F.max("val").alias("v_max"),
    )


def _assert_view_equals(view, src):
    cols = ["grp", "n_rows", "v_sum", "v_sum_n", "v_min", "v_max"]
    got = sorted(
        map(tuple, view.read().select(*cols).collect()),
        key=lambda t: (t[0] is None, t),
    )
    want = sorted(
        map(tuple, _recompute(src).select(*cols).collect()),
        key=lambda t: (t[0] is None, t),
    )
    assert got == want


def test_initial_build(spark, tmp_path):
    src, view = _mk(
        spark, tmp_path, [(i, f"g{i % 3}", 10 * i) for i in range(12)]
    )
    r = sync_agg_view(src, view, ["grp"], SPECS)
    assert r["initial_build"] and r["synced_to"] == src.version
    _assert_view_equals(view, src)
    # caught up: second sync is a no-op
    assert sync_agg_view(src, view, ["grp"], SPECS)["skipped"]


def test_insert_only_fold(spark, tmp_path):
    src, view = _mk(spark, tmp_path, [(i, "a", i) for i in range(5)])
    sync_agg_view(src, view, ["grp"], SPECS)
    src.merge(_batch(spark, [(100, "a", -7), (101, "b", 3)]),
              epoch_id="e2", order_cols=("eid",), drop_cols=())
    r = sync_agg_view(src, view, ["grp"], SPECS)
    assert r["dirty_groups"] == 0  # inserts never need repair
    _assert_view_equals(view, src)


def test_delete_of_min_triggers_repair(spark, tmp_path):
    src, view = _mk(
        spark, tmp_path, [(i, "a", i) for i in range(6)]  # min=0 max=5
    )
    sync_agg_view(src, view, ["grp"], SPECS)
    src.merge(_batch(spark, [(0, "a", 0)], op="D"),
              epoch_id="e2", order_cols=("eid",), drop_cols=())
    r = sync_agg_view(src, view, ["grp"], SPECS)
    assert r["dirty_groups"] == 1
    _assert_view_equals(view, src)
    row = view.read().where(F.col("grp") == "a").collect()[0]
    assert row["v_min"] == 1 and row["v_max"] == 5 and row["n_rows"] == 5


def test_interior_delete_no_repair(spark, tmp_path):
    src, view = _mk(
        spark, tmp_path, [(i, "a", i) for i in range(6)]
    )
    sync_agg_view(src, view, ["grp"], SPECS)
    # remove strictly-interior value: neither extreme moves
    src.merge(_batch(spark, [(3, "a", 3)], op="D"),
              epoch_id="e2", order_cols=("eid",), drop_cols=())
    r = sync_agg_view(src, view, ["grp"], SPECS)
    assert r["dirty_groups"] == 0
    _assert_view_equals(view, src)


def test_group_migration_update(spark, tmp_path):
    src, view = _mk(
        spark, tmp_path,
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)],
    )
    sync_agg_view(src, view, ["grp"], SPECS)
    # eid 2 moves a -> b AND was a's max: a repairs, b folds
    src.merge(_batch(spark, [(2, "b", 25)]),
              epoch_id="e2", order_cols=("eid",), drop_cols=())
    sync_agg_view(src, view, ["grp"], SPECS)
    _assert_view_equals(view, src)


def test_group_emptied_leaves_view(spark, tmp_path):
    src, view = _mk(
        spark, tmp_path, [(1, "a", 1), (2, "b", 2)],
    )
    sync_agg_view(src, view, ["grp"], SPECS)
    src.merge(_batch(spark, [(2, "b", 2)], op="D"),
              epoch_id="e2", order_cols=("eid",), drop_cols=())
    sync_agg_view(src, view, ["grp"], SPECS)
    assert view.read().where(F.col("grp") == "b").count() == 0
    _assert_view_equals(view, src)


def test_null_group_and_all_null_sum(spark, tmp_path):
    src, view = _mk(
        spark, tmp_path,
        [(1, None, 5), (2, None, None), (3, "a", None)],
    )
    sync_agg_view(src, view, ["grp"], SPECS)
    _assert_view_equals(view, src)
    a = view.read().where(F.col("grp") == "a").collect()[0]
    assert a["v_sum"] is None and a["v_sum_n"] == 0 and a["n_rows"] == 1
    # retract the NULL-group's only non-null value: sum returns to NULL
    src.merge(_batch(spark, [(1, None, 5)], op="D"),
              epoch_id="e2", order_cols=("eid",), drop_cols=())
    sync_agg_view(src, view, ["grp"], SPECS)
    _assert_view_equals(view, src)
    n = view.read().where(F.col("grp").isNull()).collect()[0]
    assert n["v_sum"] is None and n["n_rows"] == 1


def test_multi_epoch_catchup_and_mor(spark, tmp_path):
    src, view = _mk(
        spark, tmp_path, [(i, f"g{i % 2}", i) for i in range(8)]
    )
    sync_agg_view(src, view, ["grp"], SPECS, mode="mor")
    # three source epochs before the next sync — changes_since folds all
    src.merge(_batch(spark, [(20, "g0", 100)]), epoch_id="e2",
              order_cols=("eid",), drop_cols=())
    src.merge(_batch(spark, [(0, "g0", 0)], op="D"), epoch_id="e3",
              order_cols=("eid",), drop_cols=())
    src.merge(_batch(spark, [(21, "g1", -1)]), epoch_id="e4",
              order_cols=("eid",), drop_cols=())
    r = sync_agg_view(src, view, ["grp"], SPECS, mode="mor")
    assert r["synced_to"] == src.version
    _assert_view_equals(view, src)


def test_crash_replay_is_idempotent(spark, tmp_path):
    src, view = _mk(spark, tmp_path, [(1, "a", 1)])
    sync_agg_view(src, view, ["grp"], SPECS)
    src.merge(_batch(spark, [(2, "a", 2)]), epoch_id="e2",
              order_cols=("eid",), drop_cols=())
    sync_agg_view(src, view, ["grp"], SPECS)
    v = view.version
    # simulated replay of the same window: applied-epoch check skips
    r = sync_agg_view(src, view, ["grp"], SPECS)
    assert r["skipped"] and view.version == v
    _assert_view_equals(view, src)


def test_cursor_ahead_raises(spark, tmp_path):
    src, view = _mk(spark, tmp_path, [(1, "a", 1)])
    src.merge(_batch(spark, [(2, "a", 2)]), epoch_id="e2",
              order_cols=("eid",), drop_cols=())
    sync_agg_view(src, view, ["grp"], SPECS)
    assert av_cursor(view) == src.version >= 2
    rolled = LakeTable.load(spark, src.root, src.version - 1)
    with pytest.raises(LakeError, match="ahead"):
        sync_agg_view(rolled, view, ["grp"], SPECS)


def test_replay_integration(spark, tmp_path):
    """cdc_ingest's --agg-view-root leg: replay maintains the view
    after every epoch; final view == recompute over final state; a
    re-replay (all epochs skipped) leaves it untouched."""
    from haskell_dbfunctor_spark.cdc.apply import (
        open_or_create_transcripts, replay,
    )
    from haskell_dbfunctor_spark.cdc.generator import change_feed
    from haskell_dbfunctor_spark.lake.agg_view import (
        open_or_create_agg_view,
    )

    feed = change_feed(spark, 2000, n_convs=40, max_turns=15, n_epochs=3)
    table = open_or_create_transcripts(
        spark, str(tmp_path / "state"), num_buckets=8
    )
    specs = [Min("ts", "first_ts"), Max("ts", "last_ts"),
             Max("turn_idx", "max_turn")]
    view = open_or_create_agg_view(
        spark, str(tmp_path / "view"), table, ["role"], specs,
    )
    replay(table, feed, 3, agg_view=view,
           agg_view_group_cols=("role",), agg_view_specs=tuple(specs))
    got = sorted(map(tuple, view.read().select(
        "role", "n_rows", "first_ts", "last_ts", "max_turn"
    ).collect()))
    want = sorted(map(tuple, table.read().groupBy("role").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"),
        F.max("turn_idx").alias("max_turn"),
    ).collect()))
    assert got == want and len(got) > 0
    v = view.version
    replay(table, feed, 3, agg_view=view,
           agg_view_group_cols=("role",), agg_view_specs=tuple(specs))
    assert view.version == v  # skipped epochs never touch the view


def test_replay_zero_epoch_resume_catches_up_view(spark, tmp_path):
    """Crash-recovery contract (ADVICE r03): a crash AFTER the last
    epoch's state commit but BEFORE its view sync, followed by a resume
    where every epoch is already applied (epochs_applied == 0), must
    still bring the view current — the final catch-up sync runs
    unconditionally."""
    from haskell_dbfunctor_spark.cdc.apply import (
        open_or_create_transcripts, replay,
    )
    from haskell_dbfunctor_spark.cdc.generator import change_feed
    from haskell_dbfunctor_spark.lake.agg_view import (
        open_or_create_agg_view,
    )

    feed = change_feed(spark, 1500, n_convs=30, max_turns=12, n_epochs=2)
    table = open_or_create_transcripts(
        spark, str(tmp_path / "state"), num_buckets=8
    )
    specs = [Max("turn_idx", "max_turn")]
    view = open_or_create_agg_view(
        spark, str(tmp_path / "view"), table, ["role"], specs,
    )
    # "crash before any view sync": state fully lands, view never syncs
    replay(table, feed, 2)
    assert view.read().count() == 0
    # resume with the view leg on: all epochs skip, view must catch up
    stats = replay(table, feed, 2, agg_view=view,
                   agg_view_group_cols=("role",), agg_view_specs=tuple(specs))
    assert stats.epochs_applied == 0
    got = sorted(map(tuple, view.read().select("role", "max_turn").collect()))
    want = sorted(map(tuple, table.read().groupBy("role").agg(
        F.max("turn_idx").alias("max_turn")).collect()))
    assert got == want and len(got) > 0


def test_stream_tail_integration(spark, tmp_path):
    """cdc_ingest --stream --agg-view-root: the tailer syncs the view
    after every micro-batch; final view == recompute over the state."""
    import time as _time
    from datetime import datetime

    from haskell_dbfunctor_spark.lake.agg_view import (
        open_or_create_agg_view,
    )
    from haskell_dbfunctor_spark.streaming.tailer import (
        await_or_raise, tail_feed_dir,
    )

    schema = T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), schema,
        key_cols=["conv_id", "turn_idx"], num_buckets=4,
    )
    specs = [Min("ts", "first_ts"), Max("ts", "last_ts"),
             Max("turn_idx", "max_turn")]
    view = open_or_create_agg_view(
        spark, str(tmp_path / "view"), table, ["role"], specs,
    )
    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir)

    def seg(rows, name, mtime):
        df = spark.createDataFrame(
            rows, "op string, conv_id string, turn_idx int, role string, "
            "ts timestamp, seq long"
        )
        staging = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.parquet(staging)
        src = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
        dst = f"{feed_dir}/{name}.parquet"
        os.rename(f"{staging}/{src}", dst)
        os.utime(dst, (mtime, mtime))

    t0 = _time.time()
    seg([("U", "c1", 0, "user", datetime(2025, 1, 1), 1),
         ("U", "c1", 1, "assistant", datetime(2025, 1, 2), 2),
         ("U", "c2", 0, "user", datetime(2025, 1, 3), 3)],
        "wal-000", t0)
    seg([("D", "c1", 1, None, datetime(2025, 1, 4), 4),  # drops a max
         ("U", "c2", 7, "assistant", datetime(2025, 1, 5), 5)],
        "wal-001", t0 + 1)
    q = tail_feed_dir(
        spark, table, feed_dir, cross_batch_lww=True,
        agg_view=view, agg_view_group_cols=("role",),
        agg_view_specs=tuple(specs),
    )
    await_or_raise(q, timeout_s=240)
    got = sorted(map(tuple, view.read().select(
        "role", "n_rows", "first_ts", "last_ts", "max_turn"
    ).collect()))
    want = sorted(map(tuple, table.read().groupBy("role").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"),
        F.max("turn_idx").alias("max_turn"),
    ).collect()))
    assert got == want and len(got) > 0


def test_maintenance_cli(spark, tmp_path):
    """lake_maintenance sync-agg-view: builds the view on first run,
    idempotent-skips when caught up, rejects malformed specs."""
    import json
    import subprocess
    import sys

    src = LakeTable.create(
        spark, str(tmp_path / "src"), SRC_SCHEMA, key_cols=["eid"],
        num_buckets=2,
    )
    src.merge(_batch(spark, [(i, f"g{i % 2}", i) for i in range(10)]),
              epoch_id="e1", order_cols=("eid",), drop_cols=())
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(*extra):
        return subprocess.run(
            [sys.executable, os.path.join(repo, "jobs", "lake_maintenance.py"),
             "--table-root", str(tmp_path / "src"), "sync-agg-view",
             "--view-root", str(tmp_path / "view"), "--by", "grp",
             *extra],
            capture_output=True, text=True, cwd=repo,
        )

    p = run("--spec", "sum:val:v_sum", "--spec", "max:val:v_max")
    out = json.loads([l for l in p.stdout.splitlines() if l.startswith("{")][-1])
    assert out["initial_build"] and out["view_rows"] == 2
    p2 = run("--spec", "sum:val:v_sum", "--spec", "max:val:v_max")
    out2 = json.loads([l for l in p2.stdout.splitlines() if l.startswith("{")][-1])
    assert out2["skipped"]
    bad = run("--spec", "median:val:x")
    assert bad.returncode != 0 and "KIND" in (bad.stderr + bad.stdout)


def test_spec_validation(spark, tmp_path):
    src, _ = _mk(spark, tmp_path, [(1, "a", 1)])
    with pytest.raises(LakeError, match="collides"):
        create_agg_view(
            spark, str(tmp_path / "v2"), src, ["grp"],
            [Sum("val", "x"), Min("val", "x_n")],
        )
    with pytest.raises(LakeError, match="not in source"):
        create_agg_view(
            spark, str(tmp_path / "v3"), src, ["nope"], SPECS,
        )
