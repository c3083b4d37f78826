"""Snapshot rollback and metadata-only DROP COLUMN."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.lake.table import LakeError, LakeTable

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])


def _batch(spark, ks, tag, extra=None):
    rows = [(int(k), f"{tag}{k}") for k in ks]
    df = spark.createDataFrame(rows, "k long, v string")
    out = df.select(
        "k", "v",
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("k")).alias("ts"),
        F.lit("U").alias("op"), F.col("k").alias("seq"),
    )
    if extra:
        out = out.withColumn(extra, F.concat(F.lit("x"), F.col("k")))
    return out


def _state(t):
    return sorted(tuple(r) for r in t.read().select("k", "v").collect())


def test_rollback_restores_state_and_reopens_epochs(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         key_cols=["k"], num_buckets=2)
    t.merge(_batch(spark, range(4), "a"), epoch_id="e0")   # v1
    good = _state(t)
    t.merge(_batch(spark, [0, 1], "BAD"), epoch_id="e1")   # v2
    res = t.rollback(1)                                    # v3 == v1 content
    assert res["version"] == 3
    fresh = LakeTable.load(spark, t.root)
    assert _state(fresh) == good
    assert "e1" not in fresh.applied_epochs()
    # the bad epoch can be re-applied (fixed) after rollback
    st = fresh.merge(_batch(spark, [0, 1], "fixed"), epoch_id="e1")
    assert not st.skipped
    assert dict(_state(fresh))[0] == "fixed0"
    # rollback of the rollback rolls forward
    fresh.rollback(2)
    assert dict(_state(LakeTable.load(spark, t.root)))[0] == "BAD0"


def test_rollback_cdf_is_inverse_diff(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         key_cols=["k"], num_buckets=2)
    t.merge(_batch(spark, [1], "a"), epoch_id="e0")    # v1
    t.merge(_batch(spark, [1, 2], "b"), epoch_id="e1")  # v2: update 1, insert 2
    t.rollback(1)                                       # v3
    ch = {
        (r["k"], r["_change_type"]): r["v"]
        for r in t.changes(2, 3).collect()
    }
    assert ch == {(1, "U"): "a1", (2, "D"): "b2"}  # exact inverse
    # changes_since over the whole history still walks cleanly
    assert t.changes_since(0).count() > 0


def test_rollback_guards(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         key_cols=["k"], num_buckets=2)
    t.merge(_batch(spark, [1], "a"), epoch_id="e0")
    with pytest.raises(LakeError):
        t.rollback(99)
    st = t.merge(_batch(spark, [9], "s"), epoch_id="s", stage_only=True)
    t2 = LakeTable.load(spark, t.root)
    with pytest.raises(LakeError):
        t2.rollback(st.version)  # staged snapshots are not roll targets


def test_drop_column_metadata_only(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"),
        T.StructType(list(SCHEMA.fields) + [
            T.StructField("junk", T.StringType())
        ]),
        key_cols=["k"], num_buckets=2,
    )
    t.merge(_batch(spark, range(4), "a", extra="junk"), epoch_id="e0")
    files_before = dict(t.manifest["buckets"])
    t.analyze(["junk"])
    res = t.drop_column("junk")
    assert res["dropped"] == "junk"
    fresh = LakeTable.load(spark, t.root)
    assert "junk" not in fresh.schema.names
    assert "junk" not in fresh.read().columns
    # no data file was rewritten
    assert dict(fresh.manifest["buckets"]) == files_before
    # stats for the dead column are gone
    assert all(
        "junk" not in e
        for e in fresh._stats_map().values()
    )
    # merges no longer need (or accept) the column
    fresh.merge(_batch(spark, [7], "b"), epoch_id="e1", mode="mor")
    assert dict(_state(fresh))[7] == "b7"
    with pytest.raises(LakeError):
        fresh.merge(
            _batch(spark, [8], "c", extra="junk"), epoch_id="e2"
        )  # re-adding a dropped name would resurrect old file values
    # compaction bakes the drop into the files
    fresh.compact()
    assert dict(_state(LakeTable.load(spark, fresh.root)))[0] == "a0"


def test_drop_column_guards(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         key_cols=["k"], num_buckets=2)
    with pytest.raises(LakeError):
        t.drop_column("k")
    with pytest.raises(LakeError):
        t.drop_column("nope")
