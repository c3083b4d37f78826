"""Full-snapshot reconcile (lake/reconcile.py).

Invariant: after reconcile(table, snap), reading the table returns
exactly snap (for the carried columns), with only the DIFF merged —
identical dumps produce an empty batch, narrow dumps preserve
uncarried columns, and the change feed records the net row changes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.lake.reconcile import reconcile, snapshot_diff
from haskell_dbfunctor_spark.lake.table import (
    LakeTable, UniquenessViolationInUpsert,
)

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("txt", T.StringType()),
    T.StructField("n", T.LongType()),
])


def _mk(spark, tmp_path, rows, **kw):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key_cols=["k"], num_buckets=4,
        **kw,
    )
    if rows:
        t.merge(
            spark.createDataFrame(rows, SCHEMA), op_col=None, order_cols=(),
        )
    return t


def _snap(spark, rows, schema="k long, txt string, n long"):
    return spark.createDataFrame(rows, schema)


def _state(t):
    return sorted(tuple(r) for r in t.read().collect())


def test_insert_update_delete_in_one_pass(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a", 10), (2, "b", 20), (3, "c", 30)])
    snap = _snap(spark, [(1, "a", 10), (2, "B", 99), (4, "d", 40)])
    st = reconcile(t, snap)
    # diff = update k2 + delete k3 + insert k4 (k1 untouched)
    assert st.n_source == 3
    assert _state(t) == [(1, "a", 10), (2, "B", 99), (4, "d", 40)]


def test_identical_snapshot_is_noop_diff(spark, tmp_path):
    rows = [(1, "a", 10), (2, "b", 20)]
    t = _mk(spark, tmp_path, rows)
    assert snapshot_diff(t, _snap(spark, rows)).count() == 0
    v0 = t.version
    reconcile(t, _snap(spark, rows))
    assert _state(t) == sorted(rows)
    # no bucket got rewritten for an empty diff (version may advance
    # for the commit record, but data files must be untouched)
    files_before = set(LakeTable.load(spark, t.root)._files())
    reconcile(t, _snap(spark, rows))
    assert set(LakeTable.load(spark, t.root)._files()) == files_before
    assert t.version >= v0


def test_narrow_snapshot_preserves_uncarried_columns(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a", 10), (2, "b", 20)])
    # dump carries only (k, txt): n must survive updates
    snap = _snap(spark, [(1, "A"), (2, "b")], "k long, txt string")
    reconcile(t, snap)
    assert _state(t) == [(1, "A", 10), (2, "b", 20)]


def test_new_column_evolves_schema(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a", 10)])
    snap = _snap(
        spark, [(1, "a", 10, "t1")], "k long, txt string, n long, tool string"
    )
    reconcile(t, snap)
    got = {tuple(r) for r in t.read().collect()}
    assert got == {(1, "a", 10, "t1")}


def test_duplicate_key_snapshot_raises(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a", 10)])
    snap = _snap(spark, [(2, "x", 1), (2, "y", 2)])
    with pytest.raises(UniquenessViolationInUpsert):
        reconcile(t, snap)


def test_epoch_idempotence(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a", 10)])
    snap = _snap(spark, [(1, "a", 11)])
    st1 = reconcile(t, snap, epoch_id="dump-2024-01-02")
    st2 = reconcile(t, snap, epoch_id="dump-2024-01-02")
    assert not st1.skipped and st2.skipped
    assert _state(t) == [(1, "a", 11)]


def test_mor_reconcile(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a", 10), (2, "b", 20)])
    snap = _snap(spark, [(1, "a", 10), (2, "B", 21), (3, "c", 30)])
    reconcile(t, snap, mode="mor")
    assert _state(t) == [(1, "a", 10), (2, "B", 21), (3, "c", 30)]


def test_change_feed_records_net_changes(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a", 10), (2, "b", 20), (3, "c", 30)])
    v0 = t.version
    reconcile(t, _snap(spark, [(1, "a", 10), (2, "B", 99), (4, "d", 40)]))
    feed = t.changes_since(v0)
    got = sorted(
        (r.k, r._change_type) for r in feed.select("k", "_change_type").collect()
    )
    # k1 identical -> absent from the feed entirely
    assert [x for x in got if x[0] == 1] == []
    assert got == [(2, "U"), (3, "D"), (4, "I")]


def test_nullable_key_reconcile(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "nk"), SCHEMA, key_cols=["k"], num_buckets=2,
        nullable_keys=True,
    )
    t.merge(
        spark.createDataFrame([(None, "null-row", 1), (1, "a", 10)], SCHEMA),
        op_col=None, order_cols=(),
    )
    snap = _snap(spark, [(None, "null-row", 2), (1, "a", 10)])
    reconcile(t, snap)
    got = sorted(
        ((r.k if r.k is not None else -1), r.txt, r.n)
        for r in t.read().collect()
    )
    assert got == [(-1, "null-row", 2), (1, "a", 10)]


def test_version_diff_state_not_log(spark, tmp_path):
    from haskell_dbfunctor_spark.lake.reconcile import version_diff

    t = _mk(spark, tmp_path, [(1, "a", 10), (2, "b", 20)])
    v1 = t.version
    # churn: k1 -> X -> back to original; k2 deleted; k3 inserted
    reconcile(t, _snap(spark, [(1, "X", 10), (2, "b", 20)]))
    reconcile(t, _snap(spark, [(1, "a", 10), (3, "c", 30)]))
    d = version_diff(t, v1)
    got = sorted((r["k"], r["__rec_op"]) for r in d.collect())
    # A->B->A churn on k1 collapses to NOTHING in a state diff
    # (changes_since would show both commits)
    assert got == [(2, "D"), (3, "U")]
