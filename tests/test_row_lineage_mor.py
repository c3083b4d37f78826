"""Row lineage under merge-on-read (VERDICT r03 item 4 — the Iceberg
v3 row-tracking-under-MoR analog).

Contract: full-row MoR merges allocate PROVISIONAL ``__row_id``s per
delta row (above the manifest high-water mark, never reading the
target); the read-side collapse resolves the STABLE id per key — the
smallest id among images after the last delete tombstone — so

- a matched key keeps its base id across any number of MoR updates
  (base ids are always below provisional ids);
- a delete + reinsert gets the reinsert's fresh id (CoW parity);
- ``compact_deltas`` folds the RESOLVED ids into the base files
  bit-for-bit (reads disagree never);
- ``changes(with_lineage=True)`` across MoR windows decorates with the
  same resolved ids;
- CoW DML (delete_where/update_where) on delta-bearing buckets folds
  deltas WITH their lineage;
- ``next_row_id`` advances past every provisional allocation, so ids
  stay unique table-wide across mixed CoW/MoR histories.
"""

import os
import shutil
import sys
import uuid

import pytest
from pyspark.sql import functions as F, types as T

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from haskell_dbfunctor_spark.lake.table import (  # noqa: E402
    LAST_UPDATED_COL,
    ROW_ID_COL,
    LakeTable,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("ts", T.LongType()),
    ]
)


@pytest.fixture()
def root(tmp_path):
    d = str(tmp_path / f"rlm_{uuid.uuid4().hex[:6]}")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, ts long, op string")


def _make(spark, root, n=8):
    t = LakeTable.create(
        spark, root, SCHEMA, ["k"], num_buckets=4, row_lineage=True
    )
    t.merge(
        _batch(spark, [(i, f"v{i}", 1, "U") for i in range(n)]),
        epoch_id="e0",
        order_cols=("ts",),
        drop_cols=(),
    )
    return t


def _lineage(t):
    return {
        r["k"]: (r[ROW_ID_COL], r[LAST_UPDATED_COL])
        for r in t.read(with_lineage=True).collect()
    }


def _payload(t):
    return {r["k"]: (r["v"], r["ts"]) for r in t.read().collect()}


def test_mor_update_keeps_base_id_insert_allocates(spark, root):
    t = _make(spark, root, n=6)
    before = _lineage(t)
    hwm0 = int(t.manifest["next_row_id"])
    st = t.merge(
        _batch(
            spark,
            [(1, "upd", 2, "U"), (3, "upd", 2, "U"), (100, "new", 2, "U"),
             (5, None, 2, "D")],
        ),
        epoch_id="e1",
        mode="mor",
        order_cols=("ts",),
        drop_cols=(),
    )
    after = _lineage(t)
    # matched keys keep their base ids; version bumps to the MoR commit
    for k in (1, 3):
        assert after[k][0] == before[k][0]
        assert after[k][1] == st.version
    # untouched keys keep both fields bit-for-bit
    for k in (0, 2, 4):
        assert after[k] == before[k]
    # the insert allocated a provisional id above the old high-water
    assert after[100][0] >= hwm0 and after[100][1] == st.version
    # the delete is gone; next_row_id advanced past every provisional
    assert 5 not in after
    assert int(t.manifest["next_row_id"]) > hwm0
    ids = [rid for rid, _ in after.values()]
    assert len(ids) == len(set(ids))
    assert _payload(t)[1] == ("upd", 2)


def test_mor_delete_reinsert_gets_fresh_id(spark, root):
    t = _make(spark, root, n=4)
    old_id = _lineage(t)[2][0]
    t.merge(
        _batch(spark, [(2, None, 2, "D")]),
        epoch_id="e1", mode="mor", order_cols=("ts",), drop_cols=(),
    )
    assert 2 not in _lineage(t)
    t.merge(
        _batch(spark, [(2, "back", 3, "U")]),
        epoch_id="e2", mode="mor", order_cols=("ts",), drop_cols=(),
    )
    after = _lineage(t)
    assert after[2][0] != old_id and after[2][0] > old_id
    ids = [rid for rid, _ in after.values()]
    assert len(ids) == len(set(ids))


def test_compact_deltas_folds_resolved_ids(spark, root):
    t = _make(spark, root, n=6)
    t.merge(
        _batch(spark, [(0, "a", 2, "U"), (9, "i", 2, "U"), (1, None, 2, "D")]),
        epoch_id="e1", mode="mor", order_cols=("ts",), drop_cols=(),
    )
    t.merge(
        _batch(spark, [(9, "i2", 3, "U"), (2, None, 3, "D")]),
        epoch_id="e2", mode="mor", order_cols=("ts",), drop_cols=(),
    )
    before = _lineage(t)
    pay_before = _payload(t)
    assert t.manifest.get("delta_files")
    t.compact_deltas()
    assert not t.manifest.get("delta_files")
    assert _lineage(t) == before
    assert _payload(t) == pay_before
    # post-compaction merges still see the carried ids
    st = t.merge(
        _batch(spark, [(9, "i3", 4, "U")]),
        epoch_id="e3", order_cols=("ts",), drop_cols=(),
    )
    after = _lineage(t)
    assert after[9][0] == before[9][0] and after[9][1] == st.version


def test_changes_with_lineage_across_mor_window(spark, root):
    t = _make(spark, root, n=6)
    v0 = t.version
    t.merge(
        _batch(spark, [(1, "x", 2, "U"), (50, "n", 2, "U"), (3, None, 2, "D")]),
        epoch_id="e1", mode="mor", order_cols=("ts",), drop_cols=(),
    )
    live = _lineage(t)
    ch = {
        r["k"]: (r["_change_type"], r[ROW_ID_COL])
        for r in t.changes(v0, with_lineage=True).collect()
    }
    assert set(ch) == {1, 50, 3}
    assert ch[1] == ("U", live[1][0])
    assert ch[50] == ("I", live[50][0])
    assert ch[3][0] == "D"


def test_cow_dml_folds_delta_buckets_with_lineage(spark, root):
    t = _make(spark, root, n=8)
    t.merge(
        _batch(spark, [(i, f"m{i}", 2, "U") for i in range(8)]),
        epoch_id="e1", mode="mor", order_cols=("ts",), drop_cols=(),
    )
    before = _lineage(t)
    t.delete_where("k = 6")  # CoW folds the delta-bearing buckets
    after = _lineage(t)
    assert 6 not in after
    for k, lin in before.items():
        if k != 6:
            assert after[k] == lin
    st = t.update_where("k = 2", {"v": F.lit("patched")})
    after2 = _lineage(t)
    assert after2[2][0] == before[2][0]
    assert after2[2][1] == st.version
    assert _payload(t)[2] == ("patched", 2)


def test_mixed_cow_mor_history_unique_ids(spark, root):
    """Alternate CoW and MoR epochs over colliding keys; ids stay
    unique, stable for never-deleted keys, and payload equals an
    all-CoW replay of the same feed."""
    t = _make(spark, root, n=5)
    cow = LakeTable.create(
        spark, root + "_cow", SCHEMA, ["k"], num_buckets=4,
        row_lineage=True,
    )
    cow.merge(
        _batch(spark, [(i, f"v{i}", 1, "U") for i in range(5)]),
        epoch_id="e0", order_cols=("ts",), drop_cols=(),
    )
    feed = [
        [(0, "a", 2, "U"), (7, "b", 2, "U"), (3, None, 2, "D")],
        [(3, "back", 3, "U"), (7, "b2", 3, "U"), (1, None, 3, "D")],
        [(9, "c", 4, "U"), (0, "a2", 4, "U")],
    ]
    birth = {k: None for k in range(5)}
    for i, rows in enumerate(feed):
        mode = "mor" if i % 2 == 0 else "cow"
        pre = _lineage(t)
        t.merge(
            _batch(spark, rows), epoch_id=f"f{i}", mode=mode,
            order_cols=("ts",), drop_cols=(),
        )
        cow.merge(
            _batch(spark, rows), epoch_id=f"f{i}",
            order_cols=("ts",), drop_cols=(),
        )
        post = _lineage(t)
        for k, op in {r[0]: r[3] for r in rows}.items():
            if op == "D":
                assert k not in post
            elif k in pre:
                assert post[k][0] == pre[k][0]  # update keeps the id
        ids = [rid for rid, _ in post.values()]
        assert len(ids) == len(set(ids))
    assert _payload(t) == _payload(cow)
    assert set(_lineage(t)) == set(_lineage(cow))
    del birth


def test_dv_merge_preserves_ids(spark, root):
    """DV-mode MERGE on a lineage table (round 4): matched winner
    images carry the target's id from the match scan; inserts allocate
    above the high-water mark; deletes vector positions out."""
    t = _make(spark, root, n=6)
    before = _lineage(t)
    hwm0 = int(t.manifest["next_row_id"])
    st = t.merge(
        _batch(
            spark,
            [(1, "dv", 2, "U"), (4, None, 2, "D"), (77, "new", 2, "U")],
        ),
        epoch_id="e1", mode="dv", order_cols=("ts",), drop_cols=(),
    )
    after = _lineage(t)
    assert after[1][0] == before[1][0] and after[1][1] == st.version
    assert 4 not in after
    assert after[77][0] >= hwm0 and after[77][1] == st.version
    for k in (0, 2, 3, 5):
        assert after[k] == before[k]
    ids = [rid for rid, _ in after.values()]
    assert len(ids) == len(set(ids))
    assert int(t.manifest["next_row_id"]) > hwm0
    assert _payload(t)[1] == ("dv", 2)
    # compact folds the vectors away with ids intact
    t.compact(min_files=1, dv_ratio=0.0)
    assert _lineage(t) == after


def test_dv_merge_matched_filter_lww(spark, root):
    """Cross-batch LWW through a DV merge keeps the veto'd target row
    AND its lineage untouched."""
    from haskell_dbfunctor_spark.streaming.tailer import (
        lww_matched_filter,
    )

    t = _make(spark, root, n=3)
    before = _lineage(t)
    t.merge(
        _batch(spark, [(1, "stale", 0, "U")]),  # ts 0 < stored ts 1
        epoch_id="e1", mode="dv", order_cols=("ts",), drop_cols=(),
        matched_filter=lww_matched_filter(("ts",)),
    )
    after = _lineage(t)
    assert after[1] == before[1]
    assert _payload(t)[1] == ("v1", 1)  # stale write veto'd
