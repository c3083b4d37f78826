"""Streaming tailer (foreachBatch epoch apply) and multimodal plumbing."""

import os

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.cdc.generator import KEY_COLS, change_feed
from haskell_dbfunctor_spark.lake.table import LakeTable
from haskell_dbfunctor_spark.pipelines.multimodal import (
    attach_fake_media, decode_media, frame_sample, media_features,
)
from haskell_dbfunctor_spark.streaming.tailer import tail_feed_dir

N_EVENTS = 4000
N_EPOCHS = 4


def _final_state_oracle(spark, feed):
    """Sequential LWW apply over the whole feed (batch oracle)."""
    w = F.struct("ts", "seq")
    last = feed.groupBy(*KEY_COLS).agg(
        F.max_by(F.struct("op", "role", "text", "tool", "ts"), w).alias("x")
    )
    return (
        last.where(F.col("x.op") != "D")
        .select(*KEY_COLS, "x.role", "x.text", "x.tool", "x.ts")
    )


def test_stream_tail_matches_batch_oracle(spark, tmp_path):
    feed = change_feed(spark, N_EVENTS, n_convs=40, n_epochs=N_EPOCHS)
    feed_dir = str(tmp_path / "feed")
    # one file per epoch = the WAL segment layout
    feed.repartition(1, "epoch").write.partitionBy("epoch").parquet(feed_dir)

    schema = T.StructType(
        [f for f in feed.schema.fields if f.name not in ("op", "seq", "epoch")]
    )
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), schema, key_cols=KEY_COLS, num_buckets=8
    )
    q = tail_feed_dir(
        spark, table, feed_dir, available_now=True, max_files_per_trigger=2
    )
    q.awaitTermination(300)

    got = table.read().select(*KEY_COLS, "text").sort(*KEY_COLS)
    want = _final_state_oracle(spark, feed).select(*KEY_COLS, "text").sort(*KEY_COLS)
    assert [r.asDict() for r in got.collect()] == [
        r.asDict() for r in want.collect()
    ]
    # each micro-batch committed as a stream epoch
    assert any(e.startswith("stream-") for e in table.applied_epochs())


def test_stream_restart_is_idempotent(spark, tmp_path):
    feed = change_feed(spark, N_EVENTS, n_convs=40, n_epochs=N_EPOCHS)
    feed_dir = str(tmp_path / "feed")
    feed.repartition(1, "epoch").write.partitionBy("epoch").parquet(feed_dir)
    schema = T.StructType(
        [f for f in feed.schema.fields if f.name not in ("op", "seq", "epoch")]
    )
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), schema, key_cols=KEY_COLS, num_buckets=8
    )
    for _ in range(2):  # drain, then "restart" with nothing new
        q = tail_feed_dir(spark, table, feed_dir, available_now=True)
        q.awaitTermination(300)
    v_after_first = table.version
    got = table.read().count()
    want = _final_state_oracle(spark, feed).count()
    assert got == want
    # second drain found no new files -> no new table versions
    table2 = LakeTable.load(spark, str(tmp_path / "lake"))
    assert table2.version == v_after_first


def test_stream_starts_on_empty_feed_dir(spark, tmp_path):
    """A production WAL tail starts before the first segment lands:
    the reader schema comes from the table manifest, not from
    inferring over a (then-empty) feed directory."""
    feed = change_feed(spark, 500, n_convs=10, n_epochs=1)
    schema = T.StructType(
        [f for f in feed.schema.fields if f.name not in ("op", "seq", "epoch")]
    )
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), schema, key_cols=KEY_COLS, num_buckets=4
    )
    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir)
    q = tail_feed_dir(spark, table, feed_dir, available_now=True)
    q.awaitTermination(120)
    assert table.read().count() == 0
    # first segment lands; the next drain applies it
    feed.drop("epoch").coalesce(1).write.mode("append").parquet(feed_dir)
    q = tail_feed_dir(spark, table, feed_dir, available_now=True)
    q.awaitTermination(300)
    assert table.read().count() == _final_state_oracle(spark, feed).count()


def test_cross_batch_lww_protects_committed_state(spark, tmp_path):
    """A late/out-of-order WAL file applied in a LATER micro-batch must
    not overwrite newer already-committed state (default
    cross_batch_lww=True applies the ts matched-filter)."""
    import time as _time

    schema = T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), schema,
        key_cols=["conv_id", "turn_idx"], num_buckets=4,
    )
    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir)

    def seg(rows, name, mtime):
        df = spark.createDataFrame(
            rows, "op string, conv_id string, turn_idx int, text string, "
            "ts timestamp, seq long"
        )
        staging = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.parquet(staging)
        src = next(
            f for f in os.listdir(staging) if f.endswith(".parquet")
        )
        dst = f"{feed_dir}/{name}.parquet"
        os.rename(f"{staging}/{src}", dst)
        os.utime(dst, (mtime, mtime))

    from datetime import datetime
    t0 = _time.time()
    # newer event arrives FIRST (file 0), the stale one LATER (file 1)
    seg([("U", "c1", 0, "NEW", datetime(2025, 1, 2), 2)], "wal-000", t0)
    seg([("U", "c1", 0, "STALE", datetime(2025, 1, 1), 1)], "wal-001", t0 + 1)

    q = tail_feed_dir(
        spark, table, feed_dir, available_now=True, max_files_per_trigger=1
    )
    q.awaitTermination(300)
    rows = table.read().collect()
    assert len(rows) == 1
    assert rows[0]["text"] == "NEW"  # stale cross-batch write lost


def test_multimodal_decode_stub(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = media_features(docs)
    rows = {r.doc_id: r for r in feats.collect()}
    raw = {r.doc_id: r.text for r in docs.collect()}
    assert set(rows) == set(raw)
    import hashlib
    probe = next(iter(raw))
    assert rows[probe].media_len == len(raw[probe].encode())
    assert rows[probe].media_md5 == hashlib.md5(raw[probe].encode()).hexdigest()


def test_multimodal_require_real_raises(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = attach_fake_media(docs)
    with pytest.raises(NotImplementedError):
        decode_media(media, require_real=True)


def test_frame_sample_plumbing(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    media = attach_fake_media(docs)
    frames = frame_sample(media, every_n=24)
    pdf = frames.toPandas()
    meta = {r.doc_id: r.media_meta.n_frames for r in media.collect()}
    for doc_id, grp in pdf.groupby("doc_id"):
        n = meta[doc_id]
        assert list(grp.frame_idx) == list(range(0, n, 24))


def test_stateful_running_stats_carries_state_across_batches(spark, tmp_path):
    """applyInPandasWithState: GroupState must accumulate ACROSS
    micro-batches — a key appearing in both batches emits a cumulative
    (not per-batch) row the second time."""
    import pyspark.sql.types as T2

    from haskell_dbfunctor_spark.streaming.stateful import drain_running_stats

    schema = "k string, value double"
    b0 = spark.createDataFrame([("a", 1.0), ("a", 2.0), ("b", 5.0)], schema)
    b1 = spark.createDataFrame([("a", 4.0)], schema)
    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir)
    import time as _t
    t0 = _t.time()
    for i, b in enumerate((b0, b1)):
        staging = str(tmp_path / f"st{i}")
        b.coalesce(1).write.parquet(staging)
        src = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
        dst = f"{feed_dir}/wal-{i}.parquet"
        os.rename(f"{staging}/{src}", dst)
        os.utime(dst, (t0 + i, t0 + i))

    out = drain_running_stats(
        spark, feed_dir,
        T2.StructType([T2.StructField("k", T2.StringType()),
                       T2.StructField("value", T2.DoubleType())]),
        ["k"], str(tmp_path / "out"),
        max_files_per_trigger=1, checkpoint_dir=str(tmp_path / "ckpt"),
    )
    got = {r["k"]: (r["n_events"], r["sum_value"]) for r in out.collect()}
    assert got == {"a": (3, 7.0), "b": (1, 5.0)}
    # the sink recorded per-batch emissions: key 'a' appears in 2
    # batches with increasing cumulative counts
    emitted = spark.read.parquet(str(tmp_path / "out"))
    a_rows = sorted(
        (r["__batch_id"], r["n_events"]) for r in
        emitted.where(F.col("k") == "a").collect()
    )
    assert a_rows == [(0, 2), (1, 3)]


def test_windowed_agg_watermark_drops_too_late_events(spark, tmp_path):
    """Event-time windows + watermark, update mode: an event arriving
    within the watermark merges into its (still-live) window; an event
    older than the watermark is dropped — bounded state on an
    unbounded feed."""
    import time as _t
    from datetime import datetime

    import pyspark.sql.types as T2

    from haskell_dbfunctor_spark.streaming.windows import drain_windowed_stats

    ddl = "k string, value double, ts timestamp"
    # watermark mechanics (measured): the watermark used by batch N is
    # derived from batches < N, and state eviction happens at batch
    # COMMIT — so a late row is only dropped once a prior batch's
    # commit evicted its window. Batch layout:
    #   0: 10:00, 10:05              -> window 10:00 n=2
    #   1: 10:25                     -> wm after: 09:55
    #   2: 10:26                     -> wm 10:15 during; commit evicts 10:00
    #   3: 10:06 (TOO LATE, dropped), 10:22 (in watermark, merges)
    batches = [
        [("a", 1.0, datetime(2025, 1, 1, 10, 0)),
         ("a", 1.0, datetime(2025, 1, 1, 10, 5))],
        [("a", 1.0, datetime(2025, 1, 1, 10, 25))],
        [("a", 1.0, datetime(2025, 1, 1, 10, 26))],
        [("a", 1.0, datetime(2025, 1, 1, 10, 6)),
         ("a", 1.0, datetime(2025, 1, 1, 10, 22))],
    ]
    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir)
    t0 = _t.time()
    for i, rows in enumerate(batches):
        b = spark.createDataFrame(rows, ddl)
        staging = str(tmp_path / f"st{i}")
        b.coalesce(1).write.parquet(staging)
        src = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
        dst = f"{feed_dir}/wal-{i}.parquet"
        os.rename(f"{staging}/{src}", dst)
        os.utime(dst, (t0 + i, t0 + i))

    schema = T2.StructType([
        T2.StructField("k", T2.StringType()),
        T2.StructField("value", T2.DoubleType()),
        T2.StructField("ts", T2.TimestampType()),
    ])
    out = drain_windowed_stats(
        spark, feed_dir, schema, str(tmp_path / "out"),
        key_cols=["k"], window="10 minutes", watermark="10 minutes",
        mode="update", max_files_per_trigger=1,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    got = {
        r["window_start"].strftime("%H:%M"): r["n_events"]
        for r in out.collect()
    }
    assert got["10:00"] == 2   # too-late 10:06 was dropped, state evicted
    assert got["10:20"] == 3   # in-watermark 10:22 merged (10:22+10:25+10:26)


def test_stream_schema_evolution_via_restart(spark, tmp_path):
    """A feed that gains a column mid-stream: the live tail ignores it
    (file-source schema is fixed at start); restarting the tail with
    the evolved schema picks it up exactly-once, and the first
    post-restart MERGE evolves the table schema in place — no rewrite
    of old files."""
    import time as _time
    from datetime import datetime

    base_schema = T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), base_schema,
        key_cols=["conv_id", "turn_idx"], num_buckets=4,
    )
    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir)
    t0 = _time.time()

    def land(df, name, mtime):
        staging = str(tmp_path / f"st_{name}")
        df.coalesce(1).write.parquet(staging)
        src = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
        os.rename(f"{staging}/{src}", f"{feed_dir}/{name}.parquet")
        os.utime(f"{feed_dir}/{name}.parquet", (mtime, mtime))

    land(spark.createDataFrame(
        [("U", "c1", 0, "hello", datetime(2025, 1, 1), 1)],
        "op string, conv_id string, turn_idx int, text string, "
        "ts timestamp, seq long"), "wal-000", t0)
    q = tail_feed_dir(spark, table, feed_dir, available_now=True)
    q.awaitTermination(300)
    assert "tool" not in table.schema.names

    # feed evolves: new `tool` column lands
    land(spark.createDataFrame(
        [("U", "c1", 1, "uses tool", datetime(2025, 1, 2), 2, "bash")],
        "op string, conv_id string, turn_idx int, text string, "
        "ts timestamp, seq long, tool string"), "wal-001", t0 + 1)
    evolved = T.StructType(
        [T.StructField("op", T.StringType())]
        + list(base_schema)
        + [T.StructField("seq", T.LongType()),
           T.StructField("tool", T.StringType())]
    )
    q = tail_feed_dir(
        spark, table, feed_dir, available_now=True, schema=evolved
    )
    q.awaitTermination(300)
    table = LakeTable.load(spark, str(tmp_path / "lake"))
    assert "tool" in table.schema.names  # in-place ADD COLUMN, no rewrite
    got = {(r["conv_id"], r["turn_idx"]): r for r in table.read().collect()}
    assert got[("c1", 1)]["tool"] == "bash"
    assert got[("c1", 0)]["tool"] is None  # old rows read as NULL
    assert len(got) == 2  # restart replayed nothing twice (exactly-once)


def test_resize_media_dims_and_plumbing(spark, sf_dir):
    from haskell_dbfunctor_spark.pipelines.multimodal import resize_media

    media = attach_fake_media(
        spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    )
    src = {r["doc_id"]: r["media_meta"] for r in media.collect()}
    out = {r["doc_id"]: r for r in resize_media(media, max_dim=100).collect()}
    assert set(out) == set(src)
    for doc_id, m in src.items():
        r = out[doc_id]
        assert max(r["out_width"], r["out_height"]) <= 100
        assert r["out_width"] >= 1 and r["out_height"] >= 1
        if max(m["width"], m["height"]) <= 100:  # no upscaling
            assert (r["out_width"], r["out_height"]) == (m["width"], m["height"])
        else:  # exact expected dims (HALF_UP rounding, like F.round)
            import math

            s = 100.0 / max(m["width"], m["height"])
            exp_w = max(1, math.floor(m["width"] * s + 0.5))
            exp_h = max(1, math.floor(m["height"] * s + 0.5))
            assert (r["out_width"], r["out_height"]) == (exp_w, exp_h)
    with pytest.raises(NotImplementedError):
        resize_media(media, require_real=True)


def test_stream_tail_mor_mode(spark, tmp_path):
    """tail_feed_dir(mode='mor'): micro-batches append delta files
    (O(batch) writes, no base rewrites) and the drained state matches
    the batch LWW oracle on an ORDERED feed — the contract the mode
    demands (cross_batch_lww is refused under MoR because the
    matched-filter needs the target read MoR skips)."""
    import pytest as _pytest

    feed = change_feed(spark, N_EVENTS, n_convs=40, n_epochs=N_EPOCHS)
    feed_dir = str(tmp_path / "feed")
    feed.repartition(1, "epoch").write.partitionBy("epoch").parquet(feed_dir)
    # force strictly ordered file mtimes (the ordered-WAL contract):
    # the file source processes oldest-first
    t0 = 1_700_000_000
    for i, d in enumerate(sorted(os.listdir(feed_dir))):
        sub = os.path.join(feed_dir, d)
        if not os.path.isdir(sub):
            continue
        for f in os.listdir(sub):
            os.utime(os.path.join(sub, f), (t0 + i, t0 + i))

    schema = T.StructType(
        [f for f in feed.schema.fields if f.name not in ("op", "seq", "epoch")]
    )
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), schema, key_cols=KEY_COLS, num_buckets=8
    )
    with _pytest.raises(ValueError):
        tail_feed_dir(spark, table, feed_dir, mode="mor")  # unsafe combo

    q = tail_feed_dir(
        spark, table, feed_dir, available_now=True, max_files_per_trigger=2,
        cross_batch_lww=False, mode="mor",
    )
    q.awaitTermination(300)
    fresh = LakeTable.load(spark, table.root)
    assert sum(len(f) for f in fresh.manifest["delta_files"].values()) > 0
    got = fresh.read().select(*KEY_COLS, "text").sort(*KEY_COLS)
    want = _final_state_oracle(spark, feed).select(
        *KEY_COLS, "text").sort(*KEY_COLS)
    assert [r.asDict() for r in got.collect()] == [
        r.asDict() for r in want.collect()
    ]
    # folding the deltas preserves the drained state
    fresh.compact_deltas()
    assert fresh.read().count() == got.count()
