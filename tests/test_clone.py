"""Shallow/deep clone (Delta CLONE analog) — zero-copy branch of a
table's current snapshot, CoW divergence, epoch-idempotency carry, and
the expire-never-crosses-roots guard."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F, types as T

from haskell_dbfunctor_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("seq", T.LongType()),
    ]
)
BATCH_SCHEMA = T.StructType(
    list(SCHEMA.fields) + [T.StructField("op", T.StringType())]
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, BATCH_SCHEMA)


def _ts(i):
    import datetime as dt

    return dt.datetime(2026, 1, 1, 0, 0, i)


def _merge(tbl, spark, rows, epoch):
    tbl.merge(
        _batch(spark, rows), epoch_id=epoch,
        op_col="op", order_cols=("ts", "seq"),
    )


def _mk(spark, root):
    t = LakeTable.create(spark, root, SCHEMA, ["k"], num_buckets=4)
    _merge(t, spark, [(1, "a", _ts(0), 0, "U"), (2, "b", _ts(1), 1, "U")],
           "e0")
    return t


def _rows(t):
    return {(r.k, r.v) for r in t.read().select("k", "v").collect()}


def _parquet_under(root):
    return glob.glob(f"{root}/**/*.parquet", recursive=True)


def test_shallow_clone_zero_copy_reads_equal(spark, tmp_path):
    src = _mk(spark, str(tmp_path / "src"))
    c = src.shallow_clone(str(tmp_path / "clone"))
    assert _rows(c) == _rows(src) == {(1, "a"), (2, "b")}
    # zero data copied: no parquet under the clone root yet
    assert _parquet_under(str(tmp_path / "clone")) == []
    assert c.manifest["cloned_from"]["version"] == src.version


def test_clone_cow_divergence_both_directions(spark, tmp_path):
    src = _mk(spark, str(tmp_path / "src"))
    c = src.shallow_clone(str(tmp_path / "clone"))
    # write to the clone: source unchanged, clone's new file under its
    # own root
    _merge(c, spark, [(3, "c", _ts(2), 2, "U")], "e1")
    assert _rows(c) == {(1, "a"), (2, "b"), (3, "c")}
    assert _rows(src) == {(1, "a"), (2, "b")}
    assert _parquet_under(str(tmp_path / "clone"))
    # write to the source: clone pinned at its snapshot
    _merge(src, spark, [(4, "d", _ts(3), 3, "U")], "e1")
    assert _rows(LakeTable.load(spark, str(tmp_path / "clone"))) == {
        (1, "a"), (2, "b"), (3, "c")
    }


def test_clone_carries_applied_epochs(spark, tmp_path):
    src = _mk(spark, str(tmp_path / "src"))
    c = src.shallow_clone(str(tmp_path / "clone"))
    # e0 was applied on the source pre-clone: re-delivery on the clone
    # must be detected as a duplicate (idempotent resume)
    m = c.merge(
        _batch(spark, [(9, "dup", _ts(9), 9, "U")]), epoch_id="e0",
        op_col="op", order_cols=("ts", "seq"),
    )
    assert m.skipped
    assert _rows(c) == {(1, "a"), (2, "b")}


def test_clone_expire_never_deletes_source_files(spark, tmp_path):
    src = _mk(spark, str(tmp_path / "src"))
    src_files = set(_parquet_under(str(tmp_path / "src")))
    c = src.shallow_clone(str(tmp_path / "clone"))
    # rewrite every bucket on the clone so the v1 manifest's absolute
    # source refs become expirable, then expire aggressively
    _merge(c, spark, [(1, "a2", _ts(5), 5, "U"), (2, "b2", _ts(6), 6, "U")],
           "e1")
    c.expire_snapshots(keep_last=1)
    assert set(_parquet_under(str(tmp_path / "src"))) == src_files
    assert _rows(LakeTable.load(spark, str(tmp_path / "src"))) == {
        (1, "a"), (2, "b")
    }


def test_deep_clone_fully_independent(spark, tmp_path):
    src = _mk(spark, str(tmp_path / "src"))
    c = src.shallow_clone(str(tmp_path / "deep"), deep=True)
    assert _rows(c) == _rows(src)
    assert _parquet_under(str(tmp_path / "deep"))  # bytes copied
    # destroy the source wholesale: deep clone unaffected
    import shutil

    shutil.rmtree(str(tmp_path / "src"))
    again = LakeTable.load(spark, str(tmp_path / "deep"))
    assert _rows(again) == {(1, "a"), (2, "b")}


def test_shallow_clone_carries_pending_mor_deltas(spark, tmp_path):
    src = _mk(spark, str(tmp_path / "src"))
    _merge_kwargs = dict(op_col="op", order_cols=("ts", "seq"), mode="mor")
    src.merge(
        _batch(spark, [(2, "b9", _ts(7), 7, "U")]), epoch_id="e1",
        **_merge_kwargs,
    )
    assert src.manifest.get("delta_files")
    c = src.shallow_clone(str(tmp_path / "clone"))
    # the pending delta folds into the clone's read
    assert _rows(c) == {(1, "a"), (2, "b9")}
    # and the clone can compact it without touching the source
    c.compact_deltas()
    assert not LakeTable.load(
        spark, str(tmp_path / "clone")
    ).manifest.get("delta_files")
    assert _rows(LakeTable.load(spark, str(tmp_path / "src"))) == {
        (1, "a"), (2, "b9")
    }


def test_deep_clone_of_shallow_clone(spark, tmp_path):
    """Deep-promoting a shallow clone copies the out-of-root source
    refs under the new root (unique names), yielding a table that
    survives deleting BOTH ancestors."""
    src = _mk(spark, str(tmp_path / "src"))
    sc = src.shallow_clone(str(tmp_path / "sc"))
    deep = sc.shallow_clone(str(tmp_path / "deep"), deep=True)
    import shutil

    shutil.rmtree(str(tmp_path / "src"))
    shutil.rmtree(str(tmp_path / "sc"))
    again = LakeTable.load(spark, str(tmp_path / "deep"))
    assert _rows(again) == {(1, "a"), (2, "b")}
