"""RENAME COLUMN: guarded full CoW rewrite (name-keyed parquet can't
rename metadata-only without field ids); old name tombstoned; pending
deltas folded; CDF refuses to diff across the rename; old snapshots
stay vintage-consistent."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.types as T
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.lake.table import LakeError, LakeTable

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
    T.StructField("n", T.LongType()),
])


def _batch(spark, ids, v="v"):
    return spark.createDataFrame(
        [(i, f"{v}{i}", i * 10) for i in ids], "k long, v string, n long"
    )


def _make(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         key_cols=["k"], num_buckets=4)
    t.merge(_batch(spark, range(8)), epoch_id="e0", op_col=None,
            order_cols=())
    return t


def test_rename_payload_column(spark, tmp_path):
    t = _make(spark, tmp_path)
    res = t.rename_column("n", "score")
    assert res["renamed"] == {"n": "score"}
    assert "score" in t.schema.names and "n" not in t.schema.names
    rows = {r.k: r.score for r in t.read().collect()}
    assert rows == {i: i * 10 for i in range(8)}
    # merges after the rename speak the new name
    t.merge(_batch(spark, [3]).withColumnRenamed("n", "score"),
            epoch_id="e1", op_col=None, order_cols=())
    assert t.read().where(F.col("k") == 3).collect()[0].score == 30


def test_rename_key_column_keeps_layout(spark, tmp_path):
    t = _make(spark, tmp_path)
    before = {r.k for r in t.read().collect()}
    t.rename_column("k", "key_id")
    assert t.key_cols == ["key_id"]
    assert {r.key_id for r in t.read().collect()} == before
    # bucket hashing is by value: a keyed merge still prunes/updates
    b = spark.createDataFrame([(2, "w2", 99)], "key_id long, v string, n long") \
        .withColumnRenamed("n", "nn").drop("nn")
    b = spark.createDataFrame([(2, "w2")], "key_id long, v string")
    t.merge(b, epoch_id="e1", op_col=None, order_cols=())
    assert t.read().where(F.col("key_id") == 2).collect()[0].v == "w2"


def test_rename_folds_pending_deltas(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.merge(_batch(spark, [1], v="w"), epoch_id="mor", mode="mor",
            op_col=None, order_cols=())
    t.rename_column("v", "body")
    assert t.manifest.get("delta_files", {}) == {}
    assert t.read().where(F.col("k") == 1).collect()[0].body == "w1"


def test_rename_tombstones_and_validates(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.rename_column("n", "score")
    # old name is tombstoned: schema evolution may not re-add it
    assert "n" in t.manifest["dropped_columns"]
    with pytest.raises(LakeError, match="unknown column"):
        t.rename_column("n", "x")
    with pytest.raises(LakeError, match="already exists"):
        t.rename_column("v", "score")
    t.drop_column("score")
    with pytest.raises(LakeError, match="dropped earlier"):
        t.rename_column("v", "score")


def test_cdf_refuses_across_rename(spark, tmp_path):
    t = _make(spark, tmp_path)                      # v1
    t.merge(_batch(spark, [0], v="w"), epoch_id="e1",
            op_col=None, order_cols=())             # v2
    t.rename_column("v", "body")                    # v3
    t.merge(_batch(spark, [1], v="x").withColumnRenamed("v", "body"),
            epoch_id="e2", op_col=None, order_cols=())  # v4
    # windows not containing v3 still diff fine
    assert t.changes(1, 2).count() == 1
    assert t.changes(3, 4).count() == 1
    with pytest.raises(LakeError, match="rename"):
        t.changes(2, 4)


def test_old_snapshots_stay_vintage_consistent(spark, tmp_path):
    t = _make(spark, tmp_path)
    v_before = t.version
    t.rename_column("n", "score")
    old = LakeTable.load(spark, t.root, v_before)
    assert "n" in old.schema.names
    assert {r.n for r in old.read().collect()} == {i * 10 for i in range(8)}


def test_changes_segmented_across_rename(spark, tmp_path):
    """changes_segmented (VERDICT r03 item 6): the rename-crossing
    window changes() refuses splits into honest per-segment frames +
    an explicit rename marker; a consumer folding them in order
    reproduces the final snapshot."""
    t = _make(spark, tmp_path)
    v0 = t.version
    t.merge(_batch(spark, [1, 9], "b"), epoch_id="e1", op_col=None,
            order_cols=())
    t.rename_column("n", "score")
    rv = t.version
    t.merge(
        spark.createDataFrame(
            [(2, "c2", 777), (50, "c50", 500)],
            "k long, v string, score long",
        ),
        epoch_id="e2", op_col=None, order_cols=(),
    )
    # the plain diff still refuses (load-bearing for sync consumers)
    with pytest.raises(LakeError, match="rename"):
        t.changes(v0)

    segs = t.changes_segmented(v0)
    kinds = [s["kind"] for s in segs]
    assert kinds == ["changes", "rename", "changes"]
    assert segs[0]["to_version"] < rv <= segs[2]["from_version"]
    assert "n" in segs[0]["schema"].names
    assert "score" in segs[2]["schema"].names
    assert (segs[1]["old"], segs[1]["new"]) == ("n", "score")
    assert segs[1]["version"] == rv

    # fold into a dict replica: apply frames, apply the rename
    replica = {
        r["k"]: {"v": r["v"], "n": r["n"]}
        for r in LakeTable.load(spark, t.root, v0).read().collect()
    }
    for s in segs:
        if s["kind"] == "rename":
            for row in replica.values():
                row[s["new"]] = row.pop(s["old"])
            continue
        cols = [c for c in s["schema"].names]
        for r in s["df"].collect():
            if r["_change_type"] == "D":
                replica.pop(r["k"], None)
            else:
                replica[r["k"]] = {c: r[c] for c in cols if c != "k"}
    want = {
        r["k"]: {"v": r["v"], "score": r["score"]}
        for r in t.read().collect()
    }
    assert replica == want

    # rename-free window: one segment, same frame changes() gives
    segs2 = t.changes_segmented(rv)
    assert [s["kind"] for s in segs2] == ["changes"]
    a = {tuple(r) for r in segs2[0]["df"].collect()}
    b = {tuple(r) for r in t.changes(rv).collect()}
    assert a == b


def test_changes_segmented_adjacent_renames_elide_empty(spark, tmp_path):
    t = _make(spark, tmp_path)
    v0 = t.version
    t.rename_column("n", "score")
    t.rename_column("score", "pts")
    segs = t.changes_segmented(v0)
    assert [s["kind"] for s in segs] == ["rename", "rename"]
    assert (segs[0]["old"], segs[0]["new"]) == ("n", "score")
    assert (segs[1]["old"], segs[1]["new"]) == ("score", "pts")
