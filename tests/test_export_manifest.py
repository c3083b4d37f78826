"""Symlink-format manifest export (lake/export.py): an external
engine (DuckDB here) reading the listed files and projecting the
schema sidecar's columns gets EXACTLY table.read(); divergent states
(pending deltas, DVs, unmaterialized defaults) are refused until the
named maintenance op runs."""
import json
import shutil
import uuid

import duckdb
import pytest
from pyspark.sql import functions as F, types as T

from haskell_dbfunctor_spark.lake.table import LakeError, LakeTable

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.DoubleType()),
    T.StructField("name", T.StringType()),
])


@pytest.fixture()
def root(tmp_path):
    d = str(tmp_path / f"exp_{uuid.uuid4().hex[:6]}")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _make(spark, root, n=50):
    t = LakeTable.create(spark, root, SCHEMA, ["k"], num_buckets=4)
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.5).alias("v"),
        F.concat(F.lit("n"), F.col("id").cast("string")).alias("name"),
        F.lit("U").alias("op"),
    )
    t.merge(df, epoch_id="e1", order_cols=("k",), drop_cols=())
    return t


def _duck_read(res):
    paths = [
        ln for ln in open(res["manifest"]).read().splitlines() if ln
    ]
    cols = json.load(open(res["schema"]))["columns"]
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT {', '.join(cols)} FROM read_parquet(?) ORDER BY k",
        [paths],
    ).fetchall()
    con.close()
    return rows


def test_duckdb_reads_exact_table_state(spark, root):
    t = _make(spark, root)
    t.delete_where("k % 7 = 0")  # CoW delete: still raw-readable
    res = t.export_symlink_manifest()
    assert res["version"] == t.version and res["n_files"] > 0
    expect = [
        (r["k"], r["v"], r["name"])
        for r in t.read().orderBy("k").collect()
    ]
    assert _duck_read(res) == expect


def test_export_is_point_in_time(spark, root):
    t = _make(spark, root)
    res = t.export_symlink_manifest()
    before = _duck_read(res)
    # a later commit must NOT change what the exported manifest reads
    t.update_where("k < 10", {"v": F.lit(999.0)})
    assert _duck_read(res) == before
    res2 = t.export_symlink_manifest()
    assert any(r[1] == 999.0 for r in _duck_read(res2))
    # both versioned manifests coexist; the latest pointer follows
    latest = open(f"{t.root}/_symlink_format_manifest/manifest.txt").read()
    assert latest == open(res2["manifest"]).read()


def test_refuses_pending_deltas_then_exports_after_compact(spark, root):
    t = _make(spark, root)
    patch = spark.createDataFrame(
        [(1, 5.0, "x")], "k long, v double, name string"
    ).withColumn("op", F.lit("U"))
    t.merge(patch, order_cols=(), drop_cols=(), mode="mor")
    with pytest.raises(LakeError, match="MoR deltas"):
        t.export_symlink_manifest()
    t.compact_deltas()
    res = t.export_symlink_manifest()
    assert (1, 5.0, "x") in _duck_read(res)


def test_refuses_deletion_vectors_then_exports_after_compact(spark, root):
    t = _make(spark, root)
    t.delete_where("k % 5 = 0", mode="dv")
    with pytest.raises(LakeError, match="deletion vectors"):
        t.export_symlink_manifest()
    t.compact(dv_ratio=0.0)  # fold EVERY DV-bearing bucket
    res = t.export_symlink_manifest()
    ks = {r[0] for r in _duck_read(res)}
    assert not any(k % 5 == 0 for k in ks) and ks


def test_refuses_unmaterialized_defaults_then_exports_after_compact(
    spark, root
):
    t = _make(spark, root)
    t.add_column("tier", "string", default="std")
    with pytest.raises(LakeError, match="defaults"):
        t.export_symlink_manifest()
    t.rebucket(t.num_buckets)  # full rewrite materializes defaults
    res = t.export_symlink_manifest()
    cols = json.load(open(res["schema"]))["columns"]
    assert "tier" in cols
    paths = [ln for ln in open(res["manifest"]).read().splitlines() if ln]
    con = duckdb.connect()
    tiers = {
        r[0] for r in con.execute(
            "SELECT DISTINCT tier FROM read_parquet(?)", [paths]
        ).fetchall()
    }
    con.close()
    assert tiers == {"std"}


def test_replay_export_per_epoch(spark, root):
    """cdc replay with export_manifest=True refreshes the external
    listing after every applied epoch; the final listing row-matches
    the table (DuckDB readback)."""
    from haskell_dbfunctor_spark.cdc.apply import (
        open_or_create_transcripts, replay,
    )
    from haskell_dbfunctor_spark.cdc.generator import change_feed

    t = open_or_create_transcripts(spark, f"{root}/t", num_buckets=4)
    feed = change_feed(spark, n_events=4000, n_epochs=3, seed=7)
    st = replay(t, feed, 3, export_manifest=True)
    assert st.manifests_exported == 3
    man = f"{root}/t/_symlink_format_manifest/manifest.txt"
    paths = [ln for ln in open(man).read().splitlines() if ln]
    con = duckdb.connect()
    n = con.execute(
        "SELECT count(*) FROM read_parquet(?)", [paths]
    ).fetchone()[0]
    con.close()
    assert n == t.read().count()


def test_stream_tail_export_per_batch(spark, root, tmp_path):
    """tail_feed_dir(export_manifest=True) refreshes the listing per
    micro-batch; after the drain, DuckDB row-matches the table."""
    import os

    from haskell_dbfunctor_spark.cdc.generator import change_feed
    from haskell_dbfunctor_spark.cdc.apply import (
        open_or_create_transcripts,
    )
    from haskell_dbfunctor_spark.streaming.tailer import tail_feed_dir

    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir, exist_ok=True)
    feed = change_feed(spark, n_events=3000, n_epochs=2, seed=11)
    feed.where(F.col("epoch") == 0).write.mode("overwrite").parquet(
        f"{feed_dir}/seg0"
    )
    feed.where(F.col("epoch") == 1).write.mode("overwrite").parquet(
        f"{feed_dir}/seg1"
    )
    t = open_or_create_transcripts(spark, f"{root}/t", num_buckets=4)
    q = tail_feed_dir(
        spark, t, f"{feed_dir}/*", export_manifest=True,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    t = LakeTable.load(spark, f"{root}/t")
    man = f"{root}/t/_symlink_format_manifest/manifest.txt"
    paths = [ln for ln in open(man).read().splitlines() if ln]
    con = duckdb.connect()
    n = con.execute(
        "SELECT count(*) FROM read_parquet(?)", [paths]
    ).fetchone()[0]
    con.close()
    assert n == t.read().count() > 0
