"""Merge-on-read PARTIAL patches: merge(mode="mor", partial=True).

A patch batch carries only the key + the columns it sets; the read
collapse takes each column from the newest delta that set it (the
``__cols`` sentinel), one hash aggregation total. Delete tombstones
reset every column, so a post-delete patch cannot resurrect pre-delete
values. compact_deltas / CoW folds bake the same state into the base.
This is the MoR analog of the reference's UpdateCols subset-update
(/root/reference/src/Etl/Julius.hs:778-796) — CoW implements it via
the join (update_cols); MoR via column-wise patch collapse.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.lake.table import LakeError, LakeTable

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("a", T.StringType()),
    T.StructField("b", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])


def _mk(spark, root, **kw):
    return LakeTable.create(
        spark, root, SCHEMA, key_cols=["k"], num_buckets=2, **kw
    )


def _patch(spark, rows, cols, op="U", ts_base=1_700_000_000):
    """rows: list of dicts with k + subset of {a,b}."""
    fields = "k long" + "".join(f", {c} string" for c in cols)
    data = [tuple([r["k"]] + [r.get(c) for c in cols]) for r in rows]
    df = spark.createDataFrame(data, fields)
    return df.select(
        "*",
        F.timestamp_seconds(F.lit(ts_base) + F.col("k")).alias("ts"),
        F.lit(op).alias("op"),
        F.col("k").alias("seq"),
    )


def _state(table):
    return {
        r["k"]: (r["a"], r["b"])
        for r in table.read().select("k", "a", "b").collect()
    }


def test_partial_patch_keeps_unsent_columns(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.merge(_patch(spark, [{"k": 1, "a": "a1", "b": "b1"},
                           {"k": 2, "a": "a2", "b": "b2"}], ["a", "b"]),
            epoch_id="full", mode="mor")
    t.merge(_patch(spark, [{"k": 1, "a": "A1"}], ["a"]),
            epoch_id="p1", mode="mor", partial=True)
    assert _state(t) == {1: ("A1", "b1"), 2: ("a2", "b2")}


def test_patches_compose_column_wise(spark, tmp_path):
    """Newest delta PER COLUMN wins: patch(a) then patch(b) then
    patch(a) again — each column tracks its own last writer."""
    t = _mk(spark, str(tmp_path / "t"))
    t.merge(_patch(spark, [{"k": 1, "a": "a0", "b": "b0"}], ["a", "b"]),
            epoch_id="e0", mode="mor")
    t.merge(_patch(spark, [{"k": 1, "a": "a1"}], ["a"]),
            epoch_id="e1", mode="mor", partial=True)
    t.merge(_patch(spark, [{"k": 1, "b": "b2"}], ["b"]),
            epoch_id="e2", mode="mor", partial=True)
    t.merge(_patch(spark, [{"k": 1, "a": "a3"}], ["a"]),
            epoch_id="e3", mode="mor", partial=True)
    assert _state(t) == {1: ("a3", "b2")}
    # and an explicit NULL in a carried column IS a set (not "absent")
    t.merge(_patch(spark, [{"k": 1, "a": None}], ["a"]),
            epoch_id="e4", mode="mor", partial=True)
    assert _state(t) == {1: (None, "b2")}


def test_delete_then_patch_does_not_resurrect(spark, tmp_path):
    """A tombstone resets every column: a later patch re-inserts the
    key with ONLY its carried columns; pre-delete values must not
    leak back through the column-wise collapse."""
    t = _mk(spark, str(tmp_path / "t"))
    t.merge(_patch(spark, [{"k": 1, "a": "old_a", "b": "old_b"}], ["a", "b"]),
            epoch_id="e0", mode="mor")
    t.merge(_patch(spark, [{"k": 1}], [], op="D"),
            epoch_id="e1", mode="mor", partial=True)
    assert _state(t) == {}
    t.merge(_patch(spark, [{"k": 1, "b": "new_b"}], ["b"]),
            epoch_id="e2", mode="mor", partial=True)
    assert _state(t) == {1: (None, "new_b")}  # old_a must NOT reappear


def test_partial_insert_of_new_key(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.merge(_patch(spark, [{"k": 7, "a": "a7"}], ["a"]),
            epoch_id="e0", mode="mor", partial=True)
    assert _state(t) == {7: ("a7", None)}


def test_compact_and_cow_fold_partial_state(spark, tmp_path):
    """compact_deltas and a CoW merge must bake the collapsed partial
    state into the base bit-identically."""
    t = _mk(spark, str(tmp_path / "t"))
    t.merge(_patch(spark, [{"k": i, "a": f"a{i}", "b": f"b{i}"}
                           for i in range(10)], ["a", "b"]),
            epoch_id="e0", mode="mor")
    t.merge(_patch(spark, [{"k": i, "a": f"A{i}"} for i in range(0, 10, 2)],
                   ["a"]),
            epoch_id="e1", mode="mor", partial=True)
    t.merge(_patch(spark, [{"k": 3}], [], op="D"),
            epoch_id="e2", mode="mor", partial=True)
    before = _state(t)
    t.compact_deltas()
    assert t.manifest["delta_files"] == {}
    assert _state(t) == before
    # a fresh patch after compaction still works
    t.merge(_patch(spark, [{"k": 0, "b": "B0"}], ["b"]),
            epoch_id="e3", mode="mor", partial=True)
    assert _state(t)[0] == ("A0", "B0")
    # CoW merge folds the pending delta too
    t.merge(_patch(spark, [{"k": 1, "a": "cow", "b": "cow"}], ["a", "b"]),
            epoch_id="e4", mode="cow")
    assert t.manifest["delta_files"] == {}
    got = _state(t)
    assert got[0] == ("A0", "B0") and got[1] == ("cow", "cow")


def test_partial_batch_can_evolve_schema(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.merge(_patch(spark, [{"k": 1, "a": "a1", "b": "b1"}], ["a", "b"]),
            epoch_id="e0", mode="mor")
    newcol = _patch(spark, [{"k": 1}], []).withColumn("extra", F.lit("x"))
    t.merge(newcol, epoch_id="e1", mode="mor", partial=True)
    assert "extra" in t.schema.names
    row = t.read().where(F.col("k") == 1).collect()[0]
    assert (row["a"], row["b"], row["extra"]) == ("a1", "b1", "x")


def test_partial_requires_mor(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    with pytest.raises(LakeError):
        t.merge(_patch(spark, [{"k": 1, "a": "x"}], ["a"]),
                mode="cow", partial=True)


def test_partial_lww_within_batch(spark, tmp_path):
    """Within one patch batch, LWW dedup still applies before the
    delta is written (order_cols ts/seq)."""
    t = _mk(spark, str(tmp_path / "t"))
    rows = [(1, "lo", 100), (1, "hi", 200)]
    df = spark.createDataFrame(rows, "k long, a string, seq long").select(
        "k", "a",
        F.timestamp_seconds(F.lit(1_700_000_000)).alias("ts"),
        F.lit("U").alias("op"), "seq",
    )
    t.merge(df, epoch_id="e0", mode="mor", partial=True)
    assert _state(t) == {1: ("hi", None)}
