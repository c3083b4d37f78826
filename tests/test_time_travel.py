"""Snapshot isolation / time travel over the versioned lake table."""

import pyspark.sql.types as T

from haskell_dbfunctor_spark.cdc.generator import KEY_COLS, change_feed, epoch_batch
from haskell_dbfunctor_spark.lake.table import LakeTable


def test_time_travel_reads_old_snapshot(spark, tmp_path):
    feed = change_feed(spark, 2000, n_convs=20, n_epochs=2)
    schema = T.StructType(
        [f for f in feed.schema.fields if f.name not in ("op", "seq", "epoch")]
    )
    root = str(tmp_path / "lake")
    table = LakeTable.create(spark, root, schema, key_cols=KEY_COLS, num_buckets=4)
    table.merge(epoch_batch(feed, 0), epoch_id="e0")
    rows_v1 = table.read().count()
    snap_v1 = sorted(
        r.asDict().items() for r in table.read().select(*KEY_COLS, "text").collect()
    )
    table.merge(epoch_batch(feed, 1), epoch_id="e1")
    assert table.version == 2

    old = LakeTable.load(spark, root, version=1)
    assert old.read().count() == rows_v1
    assert sorted(
        r.asDict().items() for r in old.read().select(*KEY_COLS, "text").collect()
    ) == snap_v1

    hist = LakeTable.history(root)
    assert [h["version"] for h in hist] == [0, 1, 2]
    assert hist[2]["applied_epochs"] == ["e0", "e1"]


def test_tag_refs_pin_and_resolve(spark, tmp_path):
    """Iceberg tag refs: an immutable named snapshot that survives
    expire_snapshots (the ref pins it) and resolves via
    load(tag=...); re-tagging an existing name raises until
    delete_tag frees it."""
    import pytest as _pytest

    from haskell_dbfunctor_spark.lake.table import LakeError

    feed = change_feed(spark, 2000, n_convs=20, n_epochs=4)
    schema = T.StructType(
        [f for f in feed.schema.fields
         if f.name not in ("op", "seq", "epoch")]
    )
    root = str(tmp_path / "t")
    t = LakeTable.create(
        spark, root, schema, key_cols=KEY_COLS, num_buckets=4
    )
    t.merge(epoch_batch(feed, 0), epoch_id="e0")
    v_tagged = t.version
    tagged_state = sorted(
        r.asDict().items()
        for r in t.read().select(*KEY_COLS, "text").collect()
    )
    t.tag("train-run-1")
    assert t.tags() == {"train-run-1": v_tagged}
    # advance several commits, then expire down to the newest
    for e in range(1, 4):
        t.merge(epoch_batch(feed, e), epoch_id=f"e{e}")
    t.expire_snapshots(keep_last=1)
    got = LakeTable.load(spark, root, tag="train-run-1")
    assert got.version == v_tagged
    assert sorted(
        r.asDict().items()
        for r in got.read().select(*KEY_COLS, "text").collect()
    ) == tagged_state
    with _pytest.raises(LakeError):
        t.tag("train-run-1")  # immutable ref
    t.delete_tag("train-run-1")
    t.tag("train-run-1", version=t.version)  # freed, re-claimable
    with _pytest.raises(LakeError):
        LakeTable.load(spark, root, tag="nope")
