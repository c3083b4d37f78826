"""MERGE ... WHEN NOT MATCHED BY SOURCE THEN DELETE (snapshot-sync
mode, Delta parity): target rows absent from the batch are deleted,
optionally scoped by a t.-qualified filter; forces full bucket range;
CoW only; deletes surface in stats and the change feed."""

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
    T.StructField("grp", T.StringType()),
])


def _snap(spark, ids, v="v", grp="a"):
    return spark.createDataFrame(
        [(i, f"{v}{i}", grp) for i in ids], "k long, v string, grp string"
    )


def _make(spark, tmp_path, ids):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         key_cols=["k"], num_buckets=4)
    t.merge(_snap(spark, ids), epoch_id="seed", op_col=None, order_cols=())
    return t


def test_snapshot_sync_deletes_unmatched(spark, tmp_path):
    t = _make(spark, tmp_path, range(10))
    st = t.merge(_snap(spark, range(3, 13), v="w"), epoch_id="sync",
                 op_col=None, order_cols=(),
                 not_matched_by_source="delete")
    rows = {r.k: r.v for r in t.read().collect()}
    assert set(rows) == set(range(3, 13))
    assert all(v == f"w{k}" for k, v in rows.items())
    assert st.n_deleted == 3 and st.n_inserted == 3 and st.n_updated == 7
    # the CDF reports the sync deletes as 'D' rows
    d = {r.k for r in t.changes(1, 2).where(F.col("_change_type") == "D").collect()}
    assert d == {0, 1, 2}


def test_sync_filter_scopes_deletions(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         key_cols=["k"], num_buckets=4)
    seed = _snap(spark, range(5), grp="a").union(
        _snap(spark, range(5, 10), grp="b"))
    t.merge(seed, epoch_id="seed", op_col=None, order_cols=())
    # snapshot covers ONLY partition a: unmatched b-rows must survive
    t.merge(_snap(spark, [0, 1], v="w", grp="a"), epoch_id="sync",
            op_col=None, order_cols=(),
            not_matched_by_source="delete",
            not_matched_by_source_filter=F.col("t.grp") == "a")
    got = {r.k for r in t.read().collect()}
    assert got == {0, 1, 5, 6, 7, 8, 9}


def test_sync_composes_with_explicit_deletes(spark, tmp_path):
    t = _make(spark, tmp_path, range(6))
    batch = spark.createDataFrame(
        [(0, "w0", "a", "U"), (1, None, "a", "D"), (2, "w2", "a", "U")],
        "k long, v string, grp string, op string",
    )
    st = t.merge(batch, epoch_id="sync", order_cols=(),
                 not_matched_by_source="delete")
    assert {r.k for r in t.read().collect()} == {0, 2}
    assert st.n_deleted == 4  # 1 explicit + 3 by absence


def test_sync_reaches_unbatched_buckets(spark, tmp_path):
    # a 1-row batch leaves most buckets untouched by hashing; sync
    # must still examine (and delete from) ALL of them
    t = _make(spark, tmp_path, range(20))
    t.merge(_snap(spark, [7], v="w"), epoch_id="sync",
            op_col=None, order_cols=(),
            not_matched_by_source="delete")
    assert [r.k for r in t.read().collect()] == [7]


def test_sync_epoch_idempotent(spark, tmp_path):
    t = _make(spark, tmp_path, range(6))
    t.merge(_snap(spark, [1, 2], v="w"), epoch_id="sync",
            op_col=None, order_cols=(), not_matched_by_source="delete")
    st = t.merge(_snap(spark, [1, 2], v="w"), epoch_id="sync",
                 op_col=None, order_cols=(),
                 not_matched_by_source="delete")
    assert st.skipped
    assert {r.k for r in t.read().collect()} == {1, 2}


def test_sync_validation_errors(spark, tmp_path):
    t = _make(spark, tmp_path, range(4))
    b = _snap(spark, [1])
    with pytest.raises(LakeError, match="mor"):
        t.merge(b, op_col=None, order_cols=(), mode="mor",
                not_matched_by_source="delete")
    with pytest.raises(LakeError, match="must be None or 'delete'"):
        t.merge(b, op_col=None, order_cols=(),
                not_matched_by_source="update")
    with pytest.raises(LakeError, match="requires"):
        t.merge(b, op_col=None, order_cols=(),
                not_matched_by_source_filter=F.lit(True))
