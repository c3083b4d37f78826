"""Deletion vectors (delete_where(mode="dv")) — Iceberg-v3 / Delta DV
analog over this lake's manifest format.

Contracts pinned here:
- a DV delete removes exactly the TRUE-predicate rows (NULL keeps),
  writes NO data-file bytes, and leaves every base file untouched;
- reads (read / read_where / read_where_eq / changes) are DV-exact;
- rewrite paths FOLD vectors: merge CoW, compact, compact_deltas, and
  dml CoW never resurrect DV'd rows, and whole-bucket rewrites drop
  the bucket's dv refs;
- delta-bearing buckets fold copy-on-write within the same DV commit;
- MoR deltas appended AFTER a DV delete still win the collapse for
  their keys while DV'd keys stay dead;
- exactly-once epochs, rollback, clone carry, expire/orphan liveness.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest
from pyspark.sql import functions as F, types as T

from haskell_dbfunctor_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("grp", T.StringType(), True),
        T.StructField("val", T.LongType(), True),
    ]
)

ROWS = [(i, "a" if i % 3 == 0 else ("b" if i % 3 == 1 else None), i * 10)
        for i in range(60)]


def _mk(spark, root, rows=ROWS, num_buckets=8) -> LakeTable:
    t = LakeTable.create(
        spark, str(root), SCHEMA, key_cols=["k"], num_buckets=num_buckets
    )
    df = spark.createDataFrame(rows, SCHEMA).withColumn(
        "op", F.lit("U")
    ).withColumn("ts", F.lit(0).cast("long")).withColumn("seq", F.col("k"))
    t.merge(df, epoch_id="seed", order_cols=("ts", "seq"),
            drop_cols=("ts", "seq"))
    return t


def _rows(table):
    return sorted((r.k, r.grp, r.val) for r in table.read().collect())


def _base_files(table):
    return sorted(
        f for fl in table.manifest["buckets"].values() for f in fl
    )


def test_dv_delete_basic_and_zero_data_rewrite(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    before_files = _base_files(t)
    stats = t.delete_where(F.col("grp") == "a", mode="dv")
    # i%3==0 -> 20 rows; NULL-grp rows are NOT matched (SQL semantics)
    assert stats.n_deleted == 20
    assert stats.extra["dv_positions"] == 20
    assert stats.extra["delta_buckets_folded"] == 0
    # zero data files rewritten: base set is byte-identical
    assert _base_files(t) == before_files
    assert t.manifest.get("dv_files")
    expect = sorted(
        (i, "b" if i % 3 == 1 else None, i * 10)
        for i in range(60) if i % 3 != 0
    )
    assert _rows(t) == expect


def test_dv_delete_idempotent_epoch_and_redelete(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    s1 = t.delete_where("grp = 'a'", epoch_id="e1", mode="dv")
    assert s1.n_deleted == 20
    v = t.version
    s2 = t.delete_where("grp = 'a'", epoch_id="e1", mode="dv")
    assert s2.skipped and t.version == v
    # a NEW epoch re-deleting the same predicate finds nothing: the
    # prior-DV anti-join keeps counts honest
    s3 = t.delete_where("grp = 'a'", epoch_id="e2", mode="dv")
    assert s3.n_deleted == 0
    assert len(_rows(t)) == 40


def test_dv_read_where_and_point_lookup(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.analyze(["val"])
    t.analyze_bloom(["val"])
    t.delete_where("k >= 30", mode="dv")
    got = t.read_where("val", lo=250, hi=400).collect()
    assert sorted(r.k for r in got) == [25, 26, 27, 28, 29]
    # the DV'd row still bloom-hits its immutable file — the position
    # anti-join must keep the lookup exact
    assert t.read_where_eq("val", 300).count() == 0
    assert t.read_where_eq("val", 290).count() == 1


def test_update_where_cow_does_not_resurrect(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete_where("k < 10", mode="dv")
    stats = t.update_where("val >= 0", {"val": F.col("val") + 1})
    # the CoW rewrite read through the DV filter
    assert stats.n_updated == 50
    assert sorted(r.k for r in t.read().collect()) == list(range(10, 60))
    assert t.read().where("k < 10").count() == 0


def test_merge_cow_folds_dvs_and_reinsert_lives(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete_where("k = 7", mode="dv")
    assert t.read().where("k = 7").count() == 0
    # re-insert k=7 through MERGE: target read is DV-aware, touched
    # buckets rewrite, their dv refs drop
    batch = spark.createDataFrame([(7, "z", 777)], SCHEMA).withColumn(
        "op", F.lit("U")
    ).withColumn("ts", F.lit(1).cast("long")).withColumn("seq", F.lit(1))
    t.merge(batch, epoch_id="re7", order_cols=("ts", "seq"),
            drop_cols=("ts", "seq"))
    got = t.read().where("k = 7").collect()
    assert [(r.k, r.grp, r.val) for r in got] == [(7, "z", 777)]
    # the rewritten bucket dropped its dv refs
    b = str(
        spark.createDataFrame([(7,)], "k long")
        .select(t.bucket_of(F.col("k")).alias("b")).collect()[0].b
    )
    assert b not in t.manifest.get("dv_files", {})
    # rows of OTHER buckets unaffected
    assert t.read().count() == 60


def test_compact_folds_dvs(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete_where("grp = 'b'", mode="dv")
    expect = _rows(t)
    t.compact(target_file_bytes=1, min_files=1)
    assert t.manifest.get("dv_files", {}) == {}
    assert _rows(t) == expect


def test_dv_then_mor_delta_composition(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete_where("k in (3, 4)", mode="dv")
    # a LATER MoR update of k=3 resurrects it with the new image;
    # k=4 stays dead (DV drops the base row pre-collapse)
    batch = spark.createDataFrame([(3, "new", 333)], SCHEMA).withColumn(
        "op", F.lit("U")
    ).withColumn("ts", F.lit(9).cast("long")).withColumn("seq", F.lit(9))
    t.merge(batch, epoch_id="m1", order_cols=("ts", "seq"),
            drop_cols=("ts", "seq"), mode="mor")
    got = {r.k: (r.grp, r.val) for r in
           t.read().where("k in (3, 4)").collect()}
    assert got == {3: ("new", 333)}
    # compact_deltas folds BOTH the delta and the bucket's vectors
    t.compact_deltas()
    got2 = {r.k: (r.grp, r.val) for r in
            t.read().where("k in (3, 4)").collect()}
    assert got2 == {3: ("new", 333)}


def test_dv_delete_on_delta_bearing_bucket_folds_cow(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    batch = spark.createDataFrame([(5, "mor", 555)], SCHEMA).withColumn(
        "op", F.lit("U")
    ).withColumn("ts", F.lit(1).cast("long")).withColumn("seq", F.lit(1))
    t.merge(batch, epoch_id="m1", order_cols=("ts", "seq"),
            drop_cols=("ts", "seq"), mode="mor")
    assert t.manifest.get("delta_files")
    v0 = t.version
    stats = t.delete_where("grp = 'mor' or k = 40", mode="dv")
    # ONE commit: k=5 lives in a delta-bearing bucket (CoW fold),
    # k=40 in a base bucket (position delete)
    assert t.version == v0 + 1
    assert stats.n_deleted == 2
    assert stats.extra["delta_buckets_folded"] >= 1
    assert t.read().where("k in (5, 40)").count() == 0
    assert t.read().count() == 58


def test_changes_sees_dv_deletes(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    v0 = t.version
    t.delete_where("k < 3", mode="dv")
    ch = t.changes(v0).collect()
    assert sorted((r.k, r._change_type) for r in ch) == [
        (0, "D"), (1, "D"), (2, "D")
    ]


def test_rollback_restores_dv_deleted_rows(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    v0 = t.version
    t.delete_where("k < 30", mode="dv")
    assert t.read().count() == 30
    t.rollback(v0)
    assert t.read().count() == 60


def test_dv_files_survive_expire_and_orphan_gc(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete_where("k % 2 = 0", mode="dv")
    expect = _rows(t)
    t.expire_snapshots(keep_last=1)
    t.remove_orphans(grace_seconds=0)
    t2 = LakeTable.load(spark, str(tmp_path / "t"))
    assert _rows(t2) == expect
    # dv files still on disk and referenced
    dv_refs = [f for fl in t2.manifest["dv_files"].values() for f in fl]
    assert dv_refs
    for r in dv_refs:
        assert os.path.exists(os.path.join(str(tmp_path / "t"), r))


def test_dv_refs_dropped_by_expire_when_rewritten(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete_where("k % 2 = 0", mode="dv")
    dv_refs = [f for fl in t.manifest["dv_files"].values() for f in fl]
    t.compact(target_file_bytes=1, min_files=1)
    t.expire_snapshots(keep_last=1)
    # folded vectors' files die with their last referencing manifest
    for r in dv_refs:
        assert not os.path.exists(os.path.join(str(tmp_path / "t"), r))


def test_shallow_and_deep_clone_carry_dvs(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete_where("k >= 50", mode="dv")
    expect = _rows(t)
    c1 = t.shallow_clone(str(tmp_path / "c1"))
    assert _rows(c1) == expect
    c2 = t.shallow_clone(str(tmp_path / "c2"), deep=True)
    assert _rows(c2) == expect
    # deep clone of the shallow clone: carried data files keep their
    # BASENAMES (counter subdir, never a prefix) or DV joins break
    c3 = c1.shallow_clone(str(tmp_path / "c3"), deep=True)
    assert _rows(c3) == expect


def test_concurrent_merge_vs_dv_delete_conflicts(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    stale = LakeTable.load(spark, str(tmp_path / "t"))
    t.delete_where("k = 12", mode="dv")
    # a writer whose CoW read predates the DV delete on the same
    # bucket must NOT silently rebase (it would resurrect k=12)
    batch = spark.createDataFrame([(12, "x", 1)], SCHEMA).withColumn(
        "op", F.lit("U")
    ).withColumn("ts", F.lit(2).cast("long")).withColumn("seq", F.lit(2))
    # stale handle merge: its target read saw k=12 alive; the rebase
    # check compares dv refs, detects the overlap, re-executes against
    # the new head (merge retries internally) — the final state must
    # carry BOTH the delete and the new image deterministically: the
    # merge re-read the target post-DV, k=12 re-inserts
    stale.merge(batch, epoch_id="m2", order_cols=("ts", "seq"),
                drop_cols=("ts", "seq"))
    got = [(r.k, r.grp, r.val) for r in
           LakeTable.load(spark, str(tmp_path / "t")).read()
           .where("k = 12").collect()]
    assert got == [(12, "x", 1)]


def test_dv_update_basic(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    n_files0 = len(_base_files(t))
    stats = t.update_where(
        "grp = 'a'", {"val": F.col("val") + 1}, mode="dv"
    )
    # old positions vectored out, patched images appended as fresh
    # files; NULL-grp rows untouched (SQL semantics)
    assert stats.n_updated == 20
    assert stats.extra["dv_positions"] == 20
    assert stats.extra["files_appended"] >= 1
    assert len(_base_files(t)) > n_files0
    expect = sorted(
        (i, "a" if i % 3 == 0 else ("b" if i % 3 == 1 else None),
         i * 10 + (1 if i % 3 == 0 else 0))
        for i in range(60)
    )
    assert _rows(t) == expect


def test_dv_update_sees_old_row_and_repeats(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    # two successive DV updates compose: the second one's scan must
    # see the FIRST one's patched images (appended files) and not the
    # vectored old positions
    t.update_where("k = 6", {"val": F.col("val") * 2}, mode="dv")
    t.update_where("k = 6", {"val": F.col("val") + 5}, mode="dv")
    got = [(r.k, r.val) for r in t.read().where("k = 6").collect()]
    assert got == [(6, 125)]
    assert t.read().count() == 60


def test_dv_update_point_lookup_and_range(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.analyze(["val"])
    t.analyze_bloom(["val"])
    t.update_where("k = 29", {"val": F.lit(9999).cast("long")}, mode="dv")
    # old image dead, new image found (appended file has no bloom ->
    # always read)
    assert t.read_where_eq("val", 290).count() == 0
    assert [r.k for r in t.read_where_eq("val", 9999).collect()] == [29]
    assert [r.k for r in t.read_where("val", lo=9000).collect()] == [29]


def test_dv_update_on_delta_bearing_bucket_folds(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    batch = spark.createDataFrame([(5, "mor", 555)], SCHEMA).withColumn(
        "op", F.lit("U")
    ).withColumn("ts", F.lit(1).cast("long")).withColumn("seq", F.lit(1))
    t.merge(batch, epoch_id="m1", order_cols=("ts", "seq"),
            drop_cols=("ts", "seq"), mode="mor")
    v0 = t.version
    stats = t.update_where(
        "val = 555 or k = 40", {"grp": F.lit("hit")}, mode="dv"
    )
    assert t.version == v0 + 1  # one commit for both leg kinds
    assert stats.n_updated == 2
    got = {r.k: r.grp for r in
           t.read().where("k in (5, 40)").collect()}
    assert got == {5: "hit", 40: "hit"}
    assert t.read().count() == 60


def test_dv_update_epoch_idempotent(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.update_where("k < 5", {"val": F.col("val") + 1},
                   mode="dv", epoch_id="u1")
    v = t.version
    s2 = t.update_where("k < 5", {"val": F.col("val") + 1},
                        mode="dv", epoch_id="u1")
    assert s2.skipped and t.version == v
    assert sorted(r.val for r in t.read().where("k < 5").collect()) == [
        1, 11, 21, 31, 41
    ]


def test_compact_dv_ratio_trigger(spark, tmp_path):
    """DV-pressure compaction policy: a bucket whose vectored
    positions exceed dv_ratio of its estimated rows qualifies for
    compaction even when not fragmented; below the ratio it is left
    alone (and single-file buckets stay convergent)."""
    t = _mk(spark, tmp_path / "t")
    t.compact(target_file_bytes=1, min_files=1)  # 1 file/bucket
    t.delete_where("k % 3 = 0", mode="dv")  # ~33% of every bucket
    dv_buckets = set(t.manifest["dv_files"])
    assert dv_buckets
    # far above the default 10% ratio -> all DV buckets fold
    res = t.compact(min_files=999)
    assert res["buckets_compacted"] >= len(dv_buckets)
    assert t.manifest.get("dv_files", {}) == {}
    expect = _rows(t)
    # and they do NOT re-qualify next run (convergence)
    res2 = t.compact(min_files=999)
    assert res2["buckets_compacted"] == 0
    # a tiny delete below the ratio does not trigger a fold
    t.delete_where("k = 1", mode="dv")
    res3 = t.compact(min_files=999, dv_ratio=0.5)
    assert res3["buckets_compacted"] == 0
    assert t.manifest.get("dv_files")
    assert sorted(_rows(t)) == sorted(
        r for r in expect if r[0] != 1
    )


def test_dv_retention_sweep_prunes(spark, tmp_path):
    """The q119 pipeline: OPTIMIZE clustered by a time column +
    analyze + ts-bounded DV delete -> the discovery scan skips files
    whose manifest [min, max] prove no expired row, without opening
    them."""
    rows = [(i, "s", i) for i in range(400)]  # val doubles as "ts"
    t = _mk(spark, tmp_path / "t", rows=rows, num_buckets=2)
    # range-cluster on val -> sibling files hold disjoint val ranges
    t.compact(sort_by="val", min_files=1, target_file_bytes=1024)
    t.analyze(["val"])
    n_files = sum(len(fl) for fl in t.manifest["buckets"].values())
    assert n_files >= 4  # enough siblings for pruning to matter
    stats = t.delete_where("val < 100", mode="dv")
    assert stats.n_deleted == 100
    assert stats.extra["files_stat_pruned"] > 0
    assert t.read().count() == 300
    assert t.read().where("val < 100").count() == 0


def test_maintenance_cli_dv_modes(spark, tmp_path):
    """jobs/lake_maintenance.py delete-where/update-where --mode dv —
    the production retention-sweep surface."""
    from jobs.lake_maintenance import main

    t = _mk(spark, tmp_path / "t")
    rc = main(["--table-root", t.root, "delete-where",
               "--predicate", "val >= 500", "--mode", "dv",
               "--epoch-id", "sweep-1"])
    assert rc == 0
    rc = main(["--table-root", t.root, "update-where",
               "--predicate", "grp = 'a'",
               "--set", "val=val+1", "--mode", "dv"])
    assert rc == 0
    fresh = LakeTable.load(spark, t.root)
    got = sorted((r.k, r.val) for r in fresh.read().collect())
    expect = sorted(
        (i, i * 10 + (1 if i % 3 == 0 else 0))
        for i in range(60) if i * 10 < 500
    )
    assert got == expect


def test_files_df_lists_dv_kind(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete_where("k = 9", mode="dv")
    kinds = {r.kind for r in t.files_df(footers=False).collect()}
    assert "dv" in kinds
