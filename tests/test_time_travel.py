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
