"""expire_snapshots: old snapshots drop, retained ones stay readable,
shared (carried-forward) files survive."""

import os

import pyspark.sql.types as T

from haskell_dbfunctor_spark.cdc.generator import KEY_COLS, change_feed, epoch_batch
from haskell_dbfunctor_spark.lake.table import LakeTable


def test_expire_keeps_current_state(spark, tmp_path):
    feed = change_feed(spark, 3000, n_convs=30, n_epochs=3)
    schema = T.StructType(
        [f for f in feed.schema.fields if f.name not in ("op", "seq", "epoch")]
    )
    root = str(tmp_path / "lake")
    table = LakeTable.create(spark, root, schema, key_cols=KEY_COLS, num_buckets=4)
    for e in range(3):
        table.merge(epoch_batch(feed, e), epoch_id=f"e{e}")
    before = sorted(
        r.asDict().items() for r in table.read().select(*KEY_COLS, "text").collect()
    )
    n_manifests_before = len(
        # count version manifests only (under forced metadata spill
        # the dir also holds sc-*.json sidecars)
        [f for f in os.listdir(f"{root}/metadata")
         if f.startswith("v") and f.endswith(".json")]
    )
    assert n_manifests_before == 4  # v0..v3

    out = table.expire_snapshots(keep_last=2)
    assert out["expired_versions"] == [0, 1]

    # current state unchanged, current + previous snapshots still load
    table2 = LakeTable.load(spark, root)
    after = sorted(
        r.asDict().items() for r in table2.read().select(*KEY_COLS, "text").collect()
    )
    assert after == before
    prev = LakeTable.load(spark, root, version=2)
    assert prev.read().count() > 0
    # expired manifests are gone
    import pytest
    with pytest.raises(FileNotFoundError):
        LakeTable.load(spark, root, version=1)


def test_expire_prunes_emptied_snapshot_dirs(spark, tmp_path):
    """ADVICE regression: a snapshot dir whose every file expired must
    not linger as an empty data/s{v}/ directory tree (os.walk's
    topdown=False lists parents before child rmdirs happen)."""
    feed = change_feed(spark, 2000, n_convs=5, n_epochs=4)
    schema = T.StructType(
        [f for f in feed.schema.fields if f.name not in ("op", "seq", "epoch")]
    )
    root = str(tmp_path / "lake")
    table = LakeTable.create(spark, root, schema, key_cols=KEY_COLS, num_buckets=2)
    # few convs + few buckets: every epoch rewrites every bucket, so
    # early snapshots' files are fully superseded (nothing carried)
    for e in range(4):
        table.merge(epoch_batch(feed, e), epoch_id=f"e{e}", prune_buckets=False)
    table.expire_snapshots(keep_last=1)
    data_dir = os.path.join(root, "data")
    for entry in os.listdir(data_dir):
        p = os.path.join(data_dir, entry)
        has_files = any(files for _, _, files in os.walk(p))
        assert has_files, f"empty snapshot dir left behind: {entry}"


def test_expire_older_than_and_dry_run(spark, tmp_path):
    """Time-based retention: snapshots committed after ``older_than``
    are retained regardless of count; dry_run reports the exact
    expiry set and deletes nothing."""
    import os
    import time

    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    sch = T.StructType([
        T.StructField("k", T.LongType()), T.StructField("v", T.StringType()),
    ])
    root = str(tmp_path / "older")
    t = LakeTable.create(spark, root, sch, ["k"], num_buckets=2)
    for i in range(4):
        b = spark.range(i * 10, i * 10 + 5).select(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
        )
        t.merge(b, epoch_id=f"e{i}", op_col=None, order_cols=())
    meta = os.path.join(root, "metadata")
    n_manifests = lambda: len(  # noqa: E731
        [f for f in os.listdir(meta)
         if f.startswith("v") and f.endswith(".json")]
    )
    before = n_manifests()
    # everything is younger than (now - 1h): nothing expires even with
    # keep_last=1
    res = t.expire_snapshots(keep_last=1, older_than=time.time() - 3600)
    assert res["expired_versions"] == [] and n_manifests() == before
    # dry run with a future cutoff: reports expiry, deletes nothing
    dry = t.expire_snapshots(
        keep_last=1, older_than=time.time() + 3600, dry_run=True
    )
    assert dry["dry_run"] and len(dry["expired_versions"]) == before - 1
    assert n_manifests() == before
    assert LakeTable.load(spark, root).read().count() == t.read().count()
    # real expiry with the same cutoff matches the dry run's report
    res = t.expire_snapshots(keep_last=1, older_than=time.time() + 3600)
    assert res["expired_versions"] == dry["expired_versions"]
    assert res["removed_files"] == dry["removed_files"]
    assert n_manifests() == 1  # only the current head survives
    assert LakeTable.load(spark, root).read().count() == 20
