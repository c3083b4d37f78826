"""Structured-Streaming lake SINK (``format("lake")``): executors
stage Arrow batches as per-bucket MoR delta parquet; the Spark-less
commit worker CAS-registers them with exactly-once ``sink-b{N}``
epochs; version races re-seq the staged files instead of losing
ordering. Interop: sink deltas fold through compact_deltas/CoW merges
exactly like batch-MoR deltas."""

import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.types as T
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.lake.table import LakeTable
from haskell_dbfunctor_spark.streaming.lake_sink import (
    BUCKET,
    LakeMoRSinkWriter,
    prepare_sink_frame,
    write_lake_stream,
)

SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("text", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])


def _table(spark, tmp_path, name="t", **kw):
    return LakeTable.create(
        spark, str(tmp_path / name), SCHEMA,
        key_cols=["conv_id", "turn_idx"], num_buckets=8, **kw,
    )


def _feed_df(spark, rows):
    """rows: (conv_id, turn_idx, text, epoch_sec, op)"""
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, text string, sec long, "
        "op string",
    ).select(
        "conv_id", "turn_idx", "text",
        F.timestamp_seconds(F.col("sec") + 1_700_000_000).alias("ts"),
        "op",
    )


def _write_feed(spark, feed_dir, rows, part):
    _feed_df(spark, rows).coalesce(1).write.mode("append").parquet(feed_dir)


def _drain(spark, tbl, feed_dir, ckpt, **sink_kw):
    src = spark.readStream.schema(
        "conv_id string, turn_idx int, text string, ts timestamp, "
        "op string"
    ).parquet(feed_dir)
    prepared = prepare_sink_frame(tbl, src, op_col="op", width=4)
    q = write_lake_stream(
        prepared, tbl.root, checkpoint=ckpt,
        trigger={"availableNow": True}, **sink_kw,
    )
    q.awaitTermination(180)


def _state(tbl_or_spark, root=None):
    t = (
        tbl_or_spark if root is None
        else LakeTable.load(tbl_or_spark, root)
    )
    return sorted(
        (r.conv_id, r.turn_idx, r.text)
        for r in t.read().select("conv_id", "turn_idx", "text").collect()
    )


def test_sink_matches_batch_merge(spark, tmp_path):
    """Streaming the feed through format('lake') lands the same final
    state as the batch MoR merge of the same rows."""
    rows = [(f"c{i % 7}", i % 3, f"t{i}", i, "U") for i in range(60)]
    t_sink = _table(spark, tmp_path, "sink")
    t_ref = _table(spark, tmp_path, "ref")
    feed = str(tmp_path / "feed")
    _write_feed(spark, feed, rows, 0)
    _drain(spark, t_sink, feed, str(tmp_path / "ck"),
           dedup="lww", order_cols="ts")
    t_ref.merge(_feed_df(spark, rows), epoch_id="e0", order_cols=("ts",),
                drop_cols=("sec",), mode="mor")
    assert _state(spark, t_sink.root) == _state(spark, t_ref.root)
    t2 = LakeTable.load(spark, t_sink.root)
    assert "sink-b0" in t2.applied_epochs()
    assert t2.manifest.get("delta_files")  # MoR path, no base rewrite


def test_deletes_and_incremental_batches(spark, tmp_path):
    t = _table(spark, tmp_path)
    feed = str(tmp_path / "feed")
    ck = str(tmp_path / "ck")
    _write_feed(spark, feed,
                [("a", 1, "x", 1, "U"), ("b", 2, "y", 2, "U")], 0)
    _drain(spark, t, feed, ck)
    assert _state(spark, t.root) == [("a", 1, "x"), ("b", 2, "y")]
    # second availableNow run from the SAME checkpoint: only new files
    _write_feed(spark, feed,
                [("a", 1, None, 3, "D"), ("c", 3, "z", 4, "U")], 1)
    _drain(spark, t, feed, ck)
    assert _state(spark, t.root) == [("b", 2, "y"), ("c", 3, "z")]
    t2 = LakeTable.load(spark, t.root)
    eps = [e for e in t2.applied_epochs() if e.startswith("sink-")]
    assert sorted(eps) == ["sink-b0", "sink-b1"]


def test_sink_deltas_fold_through_compact_and_cow(spark, tmp_path):
    t = _table(spark, tmp_path)
    feed = str(tmp_path / "feed")
    _write_feed(spark, feed, [("a", 1, "x", 1, "U"),
                              ("b", 2, "y", 2, "U")], 0)
    _drain(spark, t, feed, str(tmp_path / "ck"))
    t2 = LakeTable.load(spark, t.root)
    t2.compact_deltas()
    assert not any(t2.manifest.get("delta_files", {}).values())
    assert _state(spark, t2.root) == [("a", 1, "x"), ("b", 2, "y")]
    # a later CoW merge beats earlier sink deltas (seq ordering)
    t2.merge(_feed_df(spark, [("a", 1, "x2", 9, "U")]), epoch_id="e1",
             order_cols=("ts",), drop_cols=("sec",))
    assert ("a", 1, "x2") in _state(spark, t2.root)


# --------------------------------------------------------------- unit
def _mk_writer(tbl, dedup="none"):
    schema = T.StructType(
        list(SCHEMA.fields)
        + [T.StructField("__op", T.StringType()),
           T.StructField(BUCKET, T.IntegerType())]
    )
    return LakeMoRSinkWriter(
        {"root": tbl.root, "dedup": dedup, "order_cols": "ts"}, schema
    )


def _arrow_batches(spark, tbl, rows):
    df = prepare_sink_frame(tbl, _feed_df(spark, rows), op_col="op")
    return df.toArrow().to_batches()


def test_commit_reseq_on_foreign_commit(spark, tmp_path):
    """A foreign merge landing between write() and commit() makes the
    staged seq stale; commit re-seqs the files and the LWW collapse
    still prefers the sink rows (written after the merge)."""
    t = _table(spark, tmp_path)
    t.merge(_feed_df(spark, [("a", 1, "old", 1, "U")]), epoch_id="e0",
            order_cols=("ts",), drop_cols=("sec",))
    w = _mk_writer(t)
    msg = w.write(iter(_arrow_batches(
        spark, t, [("a", 1, "new", 2, "U"), ("q", 9, "r", 2, "U")]
    )))
    assert msg.seq == 2
    # foreign commit claims version 2 (overlapping bucket for key a)
    t.merge(_feed_df(spark, [("a", 1, "mid", 3, "U")]), epoch_id="e1",
            order_cols=("ts",), drop_cols=("sec",))
    w.commit([msg], 0)
    t2 = LakeTable.load(spark, t.root)
    # sink committed AFTER the merge -> newest commit wins the collapse
    assert ("a", 1, "new") in _state(spark, t2.root)
    assert ("q", 9, "r") in _state(spark, t2.root)
    # staged files re-seq'd to the committed version's intent (3)
    seqs = {
        fl for b in t2.manifest["delta_files"].values() for fl in b
    }
    assert all("/s3-" in f or f.startswith("data/s3-") for f in seqs)


def test_commit_exactly_once_redelivery(spark, tmp_path):
    t = _table(spark, tmp_path)
    w = _mk_writer(t)
    batches = _arrow_batches(spark, t, [("a", 1, "x", 1, "U")])
    msg1 = w.write(iter(batches))
    w.commit([msg1], 0)
    v_after = LakeTable.load(spark, t.root).version
    # re-delivery of batch 0 (checkpoint restart): new staged attempt,
    # same batch id -> no-op + staged cleanup
    msg2 = w.write(iter(_arrow_batches(
        spark, t, [("a", 1, "dup", 2, "U")]
    )))
    w.commit([msg2], 0)
    t2 = LakeTable.load(spark, t.root)
    assert t2.version == v_after
    assert not os.path.exists(os.path.join(t.root, msg2.snap_rel))
    assert _state(spark, t2.root) == [("a", 1, "x")]


def test_commit_abort_and_empty_batch(spark, tmp_path):
    t = _table(spark, tmp_path)
    w = _mk_writer(t)
    msg = w.write(iter(_arrow_batches(spark, t, [("a", 1, "x", 1, "U")])))
    w.abort([msg, None], 0)
    assert not os.path.exists(os.path.join(t.root, msg.snap_rel))
    # empty batch: no commit, no epoch burn
    w.commit([None], 1)
    assert LakeTable.load(spark, t.root).version == 0


def test_schema_evolution_mid_stream_refused(spark, tmp_path):
    t = _table(spark, tmp_path)
    w = _mk_writer(t)
    msg = w.write(iter(_arrow_batches(spark, t, [("a", 1, "x", 1, "U")])))
    t.add_column("tool", "string")
    with pytest.raises(ValueError, match="schema evolved"):
        w.commit([msg], 0)
    assert not os.path.exists(os.path.join(t.root, msg.snap_rel))


def test_guards_refuse_unsupported_tables(spark, tmp_path):
    cases = [
        ("lin", {"row_lineage": True}, "row-lineage"),
        ("gen", {"generated_columns": {"text_len": "length(text)"}},
         "GENERATED"),
        ("con", {"constraints": {"pos": "turn_idx >= 0"}}, "constraints"),
    ]
    for name, kw, match in cases:
        if "generated_columns" in kw:
            sch = T.StructType(
                list(SCHEMA.fields)
                + [T.StructField("text_len", T.IntegerType())]
            )
            tt = LakeTable.create(
                spark, str(tmp_path / name), sch,
                key_cols=["conv_id", "turn_idx"], num_buckets=4, **kw,
            )
        else:
            tt = _table(spark, tmp_path, name, **kw)
        with pytest.raises(ValueError, match=match):
            _mk_writer(tt)
    # column defaults
    td = _table(spark, tmp_path, "dflt")
    td.merge(_feed_df(spark, [("a", 1, "x", 1, "U")]), epoch_id="e0",
             order_cols=("ts",), drop_cols=("sec",))
    td.add_column("tool", "string", default="none")
    with pytest.raises(ValueError, match="defaults"):
        _mk_writer(td)
    # lazy rebucket migration pending
    tl = _table(spark, tmp_path, "lazy")
    tl.merge(_feed_df(spark, [("a", 1, "x", 1, "U")]), epoch_id="e0",
             order_cols=("ts",), drop_cols=("sec",))
    tl.rebucket(16, lazy=True)
    with pytest.raises(ValueError, match="rebucket"):
        _mk_writer(tl)


def test_prepare_drops_null_keys_and_input_contract(spark, tmp_path):
    t = _table(spark, tmp_path)
    df = _feed_df(spark, [("a", 1, "x", 1, "U")]).unionByName(
        spark.createDataFrame(
            [(None, 2, "y", 2, "U")],
            "conv_id string, turn_idx int, text string, sec long, "
            "op string",
        ).select(
            "conv_id", "turn_idx", "text",
            F.timestamp_seconds(F.col("sec")).alias("ts"), "op",
        )
    )
    out = prepare_sink_frame(t, df, op_col="op")
    assert out.count() == 1  # NULL-keyed row dropped (default tables)
    assert out.columns == SCHEMA.names + ["__op", BUCKET]
    # missing __bucket refused at stream start
    with pytest.raises(ValueError, match="prepare_sink_frame"):
        LakeMoRSinkWriter({"root": t.root}, SCHEMA)


def test_in_task_lww_dedup(spark, tmp_path):
    t = _table(spark, tmp_path)
    w = _mk_writer(t, dedup="lww")
    msg = w.write(iter(_arrow_batches(spark, t, [
        ("a", 1, "first", 1, "U"), ("a", 1, "last", 5, "U"),
    ])))
    assert msg.n_rows == 1
    w.commit([msg], 0)
    assert _state(spark, t.root) == [("a", 1, "last")]


def test_stream_sync_via_sink_replica(spark, tmp_path):
    """lake -> lake with ZERO foreachBatch code: readStream
    format('lake_cdf') |> writeStream format('lake'). Bootstrap +
    forward sync + idempotent re-drain, deltas fold on compaction."""
    from haskell_dbfunctor_spark.lake.sync import stream_sync_table

    sch = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("ts", T.LongType()),
    ])

    def _b(ids, tag="a", op="U"):
        return spark.createDataFrame(
            [(int(i), f"{tag}_{i}", 1, op) for i in ids],
            "k long, v string, ts long, op string",
        )

    src = LakeTable.create(
        spark, str(tmp_path / "src"), sch, key_cols=["k"], num_buckets=8
    )
    src.merge(_b(range(120)), epoch_id="e0", order_cols=("ts",),
              drop_cols=())
    dst = LakeTable.create(
        spark, str(tmp_path / "replica"), sch, key_cols=["k"],
        num_buckets=4,  # replicas may choose their own layout
    )
    ckpt = str(tmp_path / "ck")
    q = stream_sync_table(spark, src.root, dst, checkpoint=ckpt,
                          via="sink")
    q.awaitTermination(180)
    dst = LakeTable.load(spark, dst.root)
    assert dst.read().count() == 120
    assert any(dst.manifest.get("delta_files", {}).values())  # MoR path

    src.merge(_b([1], "u").unionAll(_b([2], "x", op="D")),
              epoch_id="e1", order_cols=("ts",), drop_cols=())
    q = stream_sync_table(spark, src.root, dst, checkpoint=ckpt,
                          via="sink")
    q.awaitTermination(180)
    dst = LakeTable.load(spark, dst.root)
    st = {r["k"]: r["v"] for r in dst.read().collect()}
    assert len(st) == 119 and st[1] == "u_1" and 2 not in st
    # idempotent: nothing new -> no commit
    v = dst.version
    q = stream_sync_table(spark, src.root, dst, checkpoint=ckpt,
                          via="sink")
    q.awaitTermination(180)
    assert LakeTable.load(spark, dst.root).version == v
    # replica maintenance: deltas fold, state unchanged
    dst.compact_deltas()
    assert {r["k"] for r in dst.read().collect()} == set(st)
