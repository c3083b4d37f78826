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
