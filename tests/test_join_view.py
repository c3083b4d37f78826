"""Incremental join-view maintenance (lake/join_view.py).

Invariant: after any refresh sequence, the view equals a full
``fact ⋈ dim`` recompute over the sources' CURRENT snapshots — fact
inserts/updates/deletes, dim payload updates and dim deletes included
— with the dual cursor riding the view's own applied-epoch set.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.lake.join_view import (
    create_join_view,
    join_view_schema,
    jv_cursors,
    sync_join_view,
)
from haskell_dbfunctor_spark.lake.sync import sync_cursor
from haskell_dbfunctor_spark.lake.table import LakeError, LakeTable

FACT_SCHEMA = T.StructType([
    T.StructField("fid", T.LongType()),
    T.StructField("cust", T.LongType()),
    T.StructField("amount", T.LongType()),
])
DIM_SCHEMA = T.StructType([
    T.StructField("cid", T.LongType()),
    T.StructField("segment", T.StringType()),
    T.StructField("score", T.LongType()),
])


def _fact_batch(spark, rows, op="U"):
    """rows: (fid, cust, amount)."""
    return spark.createDataFrame(
        rows, "fid long, cust long, amount long"
    ).withColumn("op", F.lit(op))


def _dim_batch(spark, rows, op="U"):
    """rows: (cid, segment, score)."""
    return spark.createDataFrame(
        rows, "cid long, segment string, score long"
    ).withColumn("op", F.lit(op))


def _mk(spark, tmp_path, how="left"):
    fact = LakeTable.create(
        spark, str(tmp_path / "fact"), FACT_SCHEMA, key_cols=["fid"],
        num_buckets=4,
    )
    dim = LakeTable.create(
        spark, str(tmp_path / "dim"), DIM_SCHEMA, key_cols=["cid"],
        num_buckets=2,
    )
    fact.merge(
        _fact_batch(spark, [(i, i % 5, 10 * i) for i in range(20)]),
        epoch_id="f1", order_cols=("fid",), drop_cols=(),
    )
    dim.merge(
        _dim_batch(
            spark,
            [(c, f"seg{c % 2}", 100 + c) for c in range(4)],  # cust 4 unmatched
        ),
        epoch_id="d1", order_cols=("cid",), drop_cols=(),
    )
    view = create_join_view(spark, str(tmp_path / "view"), fact, dim)
    return fact, dim, view


def _recompute(fact, dim, how):
    d = dim.read().select(
        F.col("cid").alias("__c"), "segment", "score"
    )
    return (
        fact.read()
        .join(d, F.col("cust") == F.col("__c"), how)
        .select("fid", "cust", "amount", "segment", "score")
    )


def _assert_view_equals(view, fact, dim, how):
    got = sorted(map(tuple, view.read().select(
        "fid", "cust", "amount", "segment", "score"
    ).collect()))
    want = sorted(map(tuple, _recompute(fact, dim, how).collect()))
    assert got == want


def test_initial_build_left(spark, tmp_path):
    fact, dim, view = _mk(spark, tmp_path)
    res = sync_join_view(fact, dim, view, fk_cols=["cust"])
    assert not res["skipped"]
    assert jv_cursors(view) == (fact.version, dim.version)
    _assert_view_equals(view, fact, dim, "left")
    # unmatched fact rows (cust==4) kept with NULL dim payload
    assert view.read().where(
        F.col("cust") == 4
    ).where(F.col("segment").isNull()).count() == 4


def test_fact_side_changes(spark, tmp_path):
    fact, dim, view = _mk(spark, tmp_path)
    sync_join_view(fact, dim, view, fk_cols=["cust"])
    fact.merge(  # insert 100, update 3's amount + cust, delete 7
        _fact_batch(spark, [(100, 1, 999), (3, 2, 333)]),
        epoch_id="f2", order_cols=("fid",), drop_cols=(),
    )
    fact.merge(
        _fact_batch(spark, [(7, 0, 0)], op="D"),
        epoch_id="f3", order_cols=("fid",), drop_cols=(),
    )
    res = sync_join_view(fact, dim, view, fk_cols=["cust"])
    assert not res["skipped"]
    _assert_view_equals(view, fact, dim, "left")
    assert view.read().where(F.col("fid") == 7).count() == 0


def test_dim_side_changes(spark, tmp_path):
    fact, dim, view = _mk(spark, tmp_path)
    sync_join_view(fact, dim, view, fk_cols=["cust"])
    dim.merge(  # payload update for cid=1, delete cid=2
        _dim_batch(spark, [(1, "segX", 777)]),
        epoch_id="d2", order_cols=("cid",), drop_cols=(),
    )
    dim.merge(
        _dim_batch(spark, [(2, "x", 0)], op="D"),
        epoch_id="d3", order_cols=("cid",), drop_cols=(),
    )
    res = sync_join_view(fact, dim, view, fk_cols=["cust"])
    assert not res["skipped"]
    _assert_view_equals(view, fact, dim, "left")
    # deleted dim: fact rows stay, payload nulled (left-join semantics)
    r = view.read().where(F.col("cust") == 2).collect()
    assert r and all(x["segment"] is None for x in r)
    assert view.read().where(F.col("segment") == "segX").count() == 4


def test_both_sides_one_refresh_and_idempotence(spark, tmp_path):
    fact, dim, view = _mk(spark, tmp_path)
    sync_join_view(fact, dim, view, fk_cols=["cust"])
    fact.merge(
        _fact_batch(spark, [(200, 3, 1), (0, 3, 5)]),
        epoch_id="f2", order_cols=("fid",), drop_cols=(),
    )
    dim.merge(
        _dim_batch(spark, [(3, "hot", 1)]),
        epoch_id="d2", order_cols=("cid",), drop_cols=(),
    )
    res = sync_join_view(fact, dim, view, fk_cols=["cust"])
    assert not res["skipped"]
    _assert_view_equals(view, fact, dim, "left")
    # caught up: second call skips without a commit
    res2 = sync_join_view(fact, dim, view, fk_cols=["cust"])
    assert res2["skipped"]


def test_inner_join_semantics(spark, tmp_path):
    fact, dim, view_unused = _mk(spark, tmp_path)
    view = create_join_view(
        spark, str(os.path.join(os.path.dirname(view_unused.root), "vi")),
        fact, dim,
    )
    sync_join_view(fact, dim, view, fk_cols=["cust"], how="inner")
    # cust==4 has no dim row: absent from the inner view
    assert view.read().where(F.col("cust") == 4).count() == 0
    _assert_view_equals(view, fact, dim, "inner")
    # dim delete removes its fact rows from the view
    dim.merge(
        _dim_batch(spark, [(0, "x", 0)], op="D"),
        epoch_id="d2", order_cols=("cid",), drop_cols=(),
    )
    sync_join_view(fact, dim, view, fk_cols=["cust"], how="inner")
    assert view.read().where(F.col("cust") == 0).count() == 0
    _assert_view_equals(view, fact, dim, "inner")


def test_broadcast_fallback_path(spark, tmp_path):
    fact, dim, view = _mk(spark, tmp_path)
    sync_join_view(fact, dim, view, fk_cols=["cust"])
    dim.merge(
        _dim_batch(spark, [(1, "segY", 5), (3, "segZ", 6)]),
        epoch_id="d2", order_cols=("cid",), drop_cols=(),
    )
    res = sync_join_view(
        fact, dim, view, fk_cols=["cust"], max_collect_keys=0
    )
    assert not res["skipped"]
    _assert_view_equals(view, fact, dim, "left")


def test_collision_and_prefix(spark, tmp_path):
    fact, dim, _ = _mk(spark, tmp_path)
    dim2 = LakeTable.create(
        spark, str(tmp_path / "dim2"),
        T.StructType([
            T.StructField("cid", T.LongType()),
            T.StructField("amount", T.LongType()),  # collides with fact
        ]),
        key_cols=["cid"], num_buckets=2,
    )
    with pytest.raises(LakeError, match="collides"):
        join_view_schema(fact, dim2)
    sch = join_view_schema(fact, dim2, dim_prefix="d_")
    assert "d_amount" in sch.names


def test_jv_epoch_does_not_break_sync_cursor(spark, tmp_path):
    fact, dim, view = _mk(spark, tmp_path)
    sync_join_view(fact, dim, view, fk_cols=["cust"])
    # the jv cursor shares the retention-exempt "sync-v" prefix with a
    # non-numeric suffix; sync_table's cursor parse must skip it
    assert sync_cursor(view) == 0
    assert jv_cursors(view) != (0, 0)
