"""Row lineage (Iceberg v3 row-lineage / Delta row-tracking analog):
create(row_lineage=True) tables carry a hidden table-unique __row_id
(assigned at insert, preserved by updates and every rewrite) and
__last_updated_version (the commit that last inserted/updated the
row). Pins the contract:

- ids are unique across the live table and stable under UPDATE
  (merge matched rows, update_where CoW and DV modes);
- inserts allocate at-or-above the manifest's next_row_id high-water
  mark; the mark never regresses (including across rollback);
- layout operations (compact, rebucket, rename_column) preserve both
  columns bit-for-bit;
- full-row MoR merges allocate provisional ids and the collapse
  resolves the stable id (see test_row_lineage_mor.py); partial-patch
  MoR is rejected (no single image decides a patched row); WAP
  staging works via row-id reservation blocks (round 5 —
  test_lineage_wap.py);
- read() hides the columns unless with_lineage=True;
- concurrent lineage data commits serialize (the loser re-executes,
  so ids stay unique) — see _manifest_conflicts.
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
    LakeError,
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
    d = str(tmp_path / f"rl_{uuid.uuid4().hex[:6]}")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, ts long, op string")


def _make(spark, root, n=10, **kw):
    t = LakeTable.create(
        spark, root, SCHEMA, ["k"], num_buckets=4, row_lineage=True, **kw
    )
    t.merge(
        _batch(spark, [(i, f"a{i}", 1, "U") for i in range(n)]),
        epoch_id="e1",
        order_cols=("ts",),
        drop_cols=(),
    )
    return t


def _lineage(t):
    return {
        r["k"]: (r[ROW_ID_COL], r[LAST_UPDATED_COL])
        for r in t.read(with_lineage=True).collect()
    }


def test_insert_update_delete_lineage(spark, root):
    t = _make(spark, root)
    s1 = _lineage(t)
    assert len({rid for rid, _ in s1.values()}) == 10  # unique ids
    assert all(luv == 1 for _, luv in s1.values())
    hwm1 = int(t.manifest["next_row_id"])
    assert hwm1 > max(rid for rid, _ in s1.values())

    t.merge(
        _batch(
            spark,
            [(i, f"b{i}", 2, "U") for i in range(5)]  # updates
            + [(i, f"c{i}", 2, "U") for i in range(10, 13)]  # inserts
            + [(5, "x", 2, "D")],  # delete
        ),
        epoch_id="e2",
        order_cols=("ts",),
        drop_cols=(),
    )
    s2 = _lineage(t)
    assert 5 not in s2
    for k in range(5):  # updated: id stable, version bumped
        assert s2[k][0] == s1[k][0]
        assert s2[k][1] == 2
    for k in range(6, 10):  # untouched: bit-identical
        assert s2[k] == s1[k]
    for k in range(10, 13):  # inserted: fresh ids above the v1 mark
        assert s2[k][0] >= hwm1
        assert s2[k][1] == 2
    assert len({rid for rid, _ in s2.values()}) == len(s2)
    assert int(t.manifest["next_row_id"]) > max(
        rid for rid, _ in s2.values()
    )


def test_hidden_by_default_and_flag_validation(spark, root):
    t = _make(spark, root, n=3)
    assert ROW_ID_COL not in t.read().columns
    assert LAST_UPDATED_COL not in t.read().columns
    assert ROW_ID_COL in t.read(with_lineage=True).columns
    plain = LakeTable.create(
        spark, root + "_plain", SCHEMA, ["k"], num_buckets=2
    )
    with pytest.raises(LakeError, match="row-lineage"):
        plain.read(with_lineage=True)


def test_reserved_names_rejected(spark, root):
    bad = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField(ROW_ID_COL, T.LongType())]
    )
    with pytest.raises(LakeError, match="reserved"):
        LakeTable.create(spark, root, bad, ["k"])
    t = _make(spark, root + "_t", n=3)
    with pytest.raises(LakeError, match="reserved"):
        t.merge(
            _batch(spark, [(1, "z", 9, "U")]).withColumn(
                ROW_ID_COL, F.lit(7)
            ),
            order_cols=("ts",),
            drop_cols=(),
        )
    with pytest.raises(LakeError, match="reserved"):
        t.rename_column("v", ROW_ID_COL)


def test_mor_partial_rejected_wap_reserved(spark, root):
    """Full-row MoR is supported (test_row_lineage_mor.py); partial
    patches still cannot preserve ids and refuse loudly. WAP staging
    WORKS since round 5 via row-id reservation blocks — the full
    contract is pinned in test_lineage_wap.py; here just the refusal
    flip."""
    t = _make(spark, root, n=3)
    with pytest.raises(LakeError, match="partial"):
        t.merge(
            _batch(spark, [(1, "z", 9, "U")]),
            mode="mor",
            partial=True,
            order_cols=("ts",),
            drop_cols=(),
        )
    st = t.merge(
        _batch(spark, [(1, "z", 9, "U")]),
        stage_only=True,
        order_cols=("ts",),
        drop_cols=(),
    )
    assert not st.skipped and t.manifest.get("lineage_reservation")
    # DV-mode MERGE is SUPPORTED on lineage tables (round 4) — the
    # positive path is pinned in test_row_lineage_mor.py


def test_layout_ops_preserve_lineage(spark, root):
    t = _make(spark, root)
    t.merge(
        _batch(spark, [(i, f"b{i}", 2, "U") for i in range(3)]),
        epoch_id="e2",
        order_cols=("ts",),
        drop_cols=(),
    )
    before = _lineage(t)
    t.compact(min_files=1)
    assert _lineage(t) == before
    t.rebucket(8)
    assert _lineage(t) == before
    t.rename_column("v", "val")
    after = {
        r["k"]: (r[ROW_ID_COL], r[LAST_UPDATED_COL])
        for r in t.read(with_lineage=True).collect()
    }
    assert after == before
    assert "val" in t.read().columns


def test_dml_modes_preserve_and_bump(spark, root):
    t = _make(spark, root)
    base = _lineage(t)

    v = t.version
    t.update_where("k = 3", {"v": F.lit("dv")}, mode="dv")
    s = _lineage(t)
    assert s[3] == (base[3][0], v + 1)  # id kept, version bumped
    assert s[4] == base[4]

    v = t.version
    t.update_where("k = 4", {"v": F.lit("cow")}, mode="cow")
    s = _lineage(t)
    assert s[4] == (base[4][0], v + 1)
    assert s[6] == base[6]

    t.delete_where("k = 6", mode="dv")
    t.delete_where("k = 7", mode="cow")
    s = _lineage(t)
    assert 6 not in s and 7 not in s
    assert s[8] == base[8]  # survivors untouched by deletes
    # folding the DVs away keeps everything
    t.compact(min_files=1)
    assert _lineage(t) == s


def test_schema_evolution_keeps_lineage(spark, root):
    t = _make(spark, root, n=4)
    before = _lineage(t)
    evolved = spark.createDataFrame(
        [(2, "e2", 5, "hi", "U")], "k long, v string, ts long, extra string, op string"
    )
    t.merge(evolved, epoch_id="e2", order_cols=("ts",), drop_cols=())
    s = _lineage(t)
    assert s[2] == (before[2][0], t.version)
    assert s[1] == before[1]
    row = {r["k"]: r for r in t.read().collect()}
    assert row[2]["extra"] == "hi" and row[1]["extra"] is None


def test_rollback_keeps_hwm_monotonic(spark, root):
    t = _make(spark, root, n=4)
    v1 = t.version
    hwm1 = int(t.manifest["next_row_id"])
    t.merge(
        _batch(spark, [(10, "n", 2, "U")]),
        epoch_id="e2",
        order_cols=("ts",),
        drop_cols=(),
    )
    hwm2 = int(t.manifest["next_row_id"])
    assert hwm2 > hwm1
    t.rollback(v1)
    assert int(t.manifest["next_row_id"]) == hwm2  # never regresses
    t.merge(
        _batch(spark, [(11, "m", 3, "U")]),
        epoch_id="e3",
        order_cols=("ts",),
        drop_cols=(),
    )
    s = _lineage(t)
    assert s[11][0] >= hwm2  # fresh id above the retained-history mark


def test_concurrent_writers_unique_ids(spark, root):
    """Two handles race disjoint-key merges from the SAME snapshot:
    the loser must re-execute (never rebase), so ids stay unique."""
    t1 = _make(spark, root, n=4)
    t2 = LakeTable.load(spark, root)
    t1.merge(
        _batch(spark, [(100, "w1", 2, "U"), (101, "w1", 2, "U")]),
        epoch_id="w1",
        order_cols=("ts",),
        drop_cols=(),
    )
    # t2 still holds the old snapshot; its merge must conflict and
    # re-execute against t1's commit
    t2.merge(
        _batch(spark, [(200, "w2", 2, "U"), (201, "w2", 2, "U")]),
        epoch_id="w2",
        order_cols=("ts",),
        drop_cols=(),
    )
    final = LakeTable.load(spark, root)
    s = _lineage(final)
    assert set(s) == {0, 1, 2, 3, 100, 101, 200, 201}
    assert len({rid for rid, _ in s.values()}) == len(s)


def test_clone_carries_lineage(spark, root):
    t = _make(spark, root, n=4)
    before = _lineage(t)
    c = t.shallow_clone(root + "_clone")
    assert c.row_lineage
    assert _lineage(c) == before
    # clone diverges: an update on the clone keeps the id, source
    # untouched
    c.update_where("k = 1", {"v": F.lit("cl")}, mode="cow")
    assert _lineage(c)[1][0] == before[1][0]
    assert _lineage(t) == before


def test_cdf_with_lineage(spark, root):
    """changes(with_lineage=True) decorates the feed with the stable
    __row_id (post-image side; pre-image for deletes) WITHOUT changing
    which rows the feed emits."""
    t = _make(spark, root, n=4)  # v1
    ids = {r["k"]: r["__row_id"] for r in t.read(with_lineage=True).collect()}
    t.merge(
        _batch(
            spark,
            [(0, "b", 2, "U"), (10, "n", 2, "U"), (3, "x", 2, "D")],
        ),
        epoch_id="e2", order_cols=("ts",), drop_cols=(),
    )
    plain = {(r["k"], r["_change_type"]) for r in t.changes(1).collect()}
    lin = {
        (r["k"], r["_change_type"]): r["__row_id"]
        for r in t.changes(1, with_lineage=True).collect()
    }
    assert plain == set(lin)  # decoration never changes the feed
    assert lin[(0, "U")] == ids[0]  # update keeps the id
    assert lin[(3, "D")] == ids[3]  # delete reports the dead row's id
    assert lin[(10, "I")] not in set(ids.values())  # insert = fresh id
    # preimages variant carries the id on both U rows
    pre = {
        (r["k"], r["_change_type"]): r["__row_id"]
        for r in t.changes(1, preimages=True, with_lineage=True).collect()
    }
    assert pre[(0, "U_pre")] == pre[(0, "U_post")] == ids[0]
    # changes_since threads the flag per commit
    since = {
        (r["k"], r["_change_type"], r["_commit_version"]): r["__row_id"]
        for r in t.changes_since(1, with_lineage=True).collect()
    }
    assert since[(0, "U", 2)] == ids[0]
    plain_tbl = LakeTable.create(
        spark, root + "_p", SCHEMA, ["k"], num_buckets=2
    )
    with pytest.raises(LakeError, match="row-lineage"):
        plain_tbl.changes(0, with_lineage=True)


def test_streaming_tailer_into_lineage_table(spark, root):
    """The stream path (foreachBatch MERGE per micro-batch) on a
    row-lineage table: state matches the batch oracle, ids unique,
    and keys last touched in an early micro-batch keep their id
    through later batches (cross-batch stability under the
    cross-batch-LWW matched filter the tailer applies)."""
    import pyspark.sql.types as T

    from haskell_dbfunctor_spark.cdc.generator import (
        KEY_COLS, change_feed,
    )
    from haskell_dbfunctor_spark.streaming.tailer import tail_feed_dir

    feed = change_feed(spark, 2000, n_convs=25, n_epochs=3)
    feed_dir = root + "_feed"
    feed.repartition(1, "epoch").write.partitionBy("epoch").parquet(feed_dir)

    schema = T.StructType(
        [f for f in feed.schema.fields if f.name not in ("op", "seq", "epoch")]
    )
    table = LakeTable.create(
        spark, root, schema, key_cols=KEY_COLS, num_buckets=4,
        row_lineage=True,
    )
    q = tail_feed_dir(
        spark, table, feed_dir, available_now=True, max_files_per_trigger=1
    )
    q.awaitTermination(300)

    w = F.struct("ts", "seq")
    want = {
        (r["conv_id"], r["turn_idx"]): r["x"]["text"]
        for r in feed.groupBy(*KEY_COLS).agg(
            F.max_by(F.struct("op", "text"), w).alias("x")
        ).where(F.col("x.op") != "D").collect()
    }
    lin = table.read(with_lineage=True).collect()
    got = {(r["conv_id"], r["turn_idx"]): r["text"] for r in lin}
    assert got == want
    ids = [r[ROW_ID_COL] for r in lin]
    assert len(set(ids)) == len(ids)
    assert all(
        1 <= r[LAST_UPDATED_COL] <= table.version for r in lin
    )


def test_time_travel_lineage(spark, root):
    t = _make(spark, root, n=4)
    v1 = t.version
    t.merge(
        _batch(spark, [(1, "b", 2, "U")]),
        epoch_id="e2",
        order_cols=("ts",),
        drop_cols=(),
    )
    old = LakeTable.load(spark, root, version=v1)
    s_old = _lineage(old)
    s_new = _lineage(t)
    assert s_old[1][1] == 1 and s_new[1][1] == 2
    assert s_old[1][0] == s_new[1][0]
