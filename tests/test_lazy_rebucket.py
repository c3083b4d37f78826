"""Lazy bucket-spec evolution (``rebucket(lazy=True)``): the Iceberg
partition-spec-evolution analog for the hash-bucket layout. The rescale
is a METADATA-ONLY commit that demotes the current bucket map to a
legacy overlay; old-spec buckets migrate progressively — merges fold
the legacy buckets their batch keys hash to (own state-preserving
commit), ``migrate_legacy(max_buckets=K)`` folds cold ones on a
budget — while reads union the overlay (keys stay disjoint between the
overlay and the new spec by construction)."""

import json
import os
import sys
import threading

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.types as T
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.lake.table import (
    MANIFEST_DIR,
    CommitConflict,
    LakeError,
    LakeTable,
)
from haskell_dbfunctor_spark.lake.dml import delete_where, update_where

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
    T.StructField("ts", T.LongType()),
])


def _batch(spark, ids, tag="a", op="U", ts=0):
    return spark.createDataFrame(
        [(int(i), f"{tag}_{i}", int(ts), op) for i in ids],
        "k long, v string, ts long, op string",
    )


def _make(spark, tmp_path, *, num_buckets=8, n=400, props=None, name="t"):
    t = LakeTable.create(
        spark, str(tmp_path / name), SCHEMA, key_cols=["k"],
        num_buckets=num_buckets, properties=props,
    )
    t.merge(_batch(spark, range(n)), epoch_id="seed", order_cols=("ts",),
            drop_cols=())
    return t


def _state(t):
    return {r["k"]: r["v"] for r in t.read().collect()}


# ------------------------------------------------------------ basics
def test_rescale_is_metadata_only_and_state_preserving(spark, tmp_path):
    t = _make(spark, tmp_path)
    before = _state(t)
    res = t.rebucket(32, lazy=True)
    assert res["num_buckets"] == 32
    assert res["legacy_num_buckets"] == 8
    assert t.legacy_pending and t.num_buckets == 32
    # metadata-only: the commit created / dereferenced zero data files
    om = t.manifest["op_metrics"]
    assert om["files_added"] == 0 and om["files_removed"] == 0
    assert t.manifest["buckets"] == {}
    assert _state(t) == before
    d = t.describe()
    assert d["legacy_num_buckets"] == 8
    assert d["num_legacy_buckets_pending"] == 8


def test_rescale_drops_skipping_catalogs(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.analyze(["k"])
    t.analyze_bloom(["v"])
    assert t.manifest.get("file_stats")
    t.rebucket(32, lazy=True)
    assert not t.manifest.get("file_stats")
    assert not t.manifest.get("file_blooms")
    # reads stay exact without the catalogs
    assert t.read_where("k", 10, 20).count() == 11
    assert t.read_where_eq("v", "a_7").count() == 1


def test_merge_folds_only_touched_legacy_buckets(spark, tmp_path):
    # 64 legacy buckets, 3-key batch: at most 3 legacy buckets fold
    t = _make(spark, tmp_path, num_buckets=64, n=600)
    t.rebucket(16, lazy=True)
    pending0 = t.describe()["num_legacy_buckets_pending"]
    assert pending0 == 64
    t.merge(_batch(spark, [5, 6, 7], tag="b", ts=1), epoch_id="e1",
            order_cols=("ts",), drop_cols=())
    pending1 = t.describe()["num_legacy_buckets_pending"]
    assert 64 - 3 <= pending1 < 64
    st = _state(t)
    assert st[5] == "b_5" and st[6] == "b_6" and st[599] == "a_599"
    assert len(st) == 600


def test_merge_delete_and_insert_during_migration(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.rebucket(32, lazy=True)
    t.merge(
        _batch(spark, [3], op="D", ts=1).unionAll(
            _batch(spark, [1000, 1001], tag="n", ts=1)
        ),
        epoch_id="e1", order_cols=("ts",), drop_cols=(),
    )
    st = _state(t)
    assert 3 not in st and st[1000] == "n_1000"
    assert len(st) == 401


def test_mor_merge_prefolds_then_appends(spark, tmp_path):
    t = _make(spark, tmp_path, num_buckets=16)
    t.rebucket(4, lazy=True)
    t.merge(_batch(spark, [9, 10], tag="m", ts=1), epoch_id="e1",
            order_cols=("ts",), drop_cols=(), mode="mor")
    assert t.legacy_pending  # only the touched legacy buckets folded
    assert any(t.manifest.get("delta_files", {}).values())
    st = _state(t)
    assert st[9] == "m_9" and st[0] == "a_0" and len(st) == 400
    # compaction folds the deltas without disturbing the overlay
    t.compact_deltas()
    assert not any(t.manifest.get("delta_files", {}).values())
    assert _state(t)[9] == "m_9"


def test_migrate_legacy_budget_and_completion(spark, tmp_path):
    t = _make(spark, tmp_path)
    before = _state(t)
    t.rebucket(32, lazy=True)
    folded = 0
    while t.legacy_pending:
        r = t.migrate_legacy(max_buckets=3)
        assert r["migrated_buckets"] <= 3
        folded += r["migrated_buckets"]
    assert folded == 8
    assert "legacy_num_buckets" not in t.manifest
    assert "legacy_buckets" not in t.manifest
    assert _state(t) == before
    # restrictions lift: predicate DML works again
    delete_where(t, "k = 0")
    assert 0 not in _state(t)
    # idempotent no-op once complete
    assert t.migrate_legacy()["migrated_buckets"] == 0


def test_maintain_folds_a_slice(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.rebucket(32, lazy=True)
    out = t.maintain(max_buckets=2, keep_last=100)
    assert out["migrate_legacy"]["migrated_buckets"] == 2
    assert t.describe()["num_legacy_buckets_pending"] == 6


# --------------------------------------------------------- refusals
def test_refusals(spark, tmp_path):
    t = _make(spark, tmp_path)
    with pytest.raises(LakeError, match="already at"):
        t.rebucket(8, lazy=True)
    # pending MoR deltas
    t.merge(_batch(spark, [1], tag="d", ts=1), epoch_id="m1",
            order_cols=("ts",), drop_cols=(), mode="mor")
    with pytest.raises(LakeError, match="MoR deltas"):
        t.rebucket(32, lazy=True)
    t.compact_deltas()
    # pending DVs
    delete_where(t, "k = 2", mode="dv")
    with pytest.raises(LakeError, match="deletion vectors"):
        t.rebucket(32, lazy=True)
    t.compact(dv_ratio=0.0)
    t.rebucket(32, lazy=True)
    # nested rescale
    with pytest.raises(LakeError, match="still migrating"):
        t.rebucket(64, lazy=True)
    # WAP staging during migration
    with pytest.raises(LakeError, match="stage_only"):
        t.merge(_batch(spark, [5], ts=2), epoch_id="s1",
                order_cols=("ts",), drop_cols=(), stage_only=True)
    # predicate DML (cow + dv) during migration; MoR allowed
    with pytest.raises(LakeError, match="migrate_legacy"):
        delete_where(t, "k = 3")
    with pytest.raises(LakeError, match="migrate_legacy"):
        update_where(t, "k = 3", {"v": F.lit("x")}, mode="dv")
    delete_where(t, "k = 3", mode="mor")
    assert 3 not in _state(t)


# -------------------------------------------------------- change feed
def test_cdf_empty_across_pure_fold(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.rebucket(32, lazy=True)
    v0 = t.version
    t.migrate_legacy(max_buckets=4)
    assert t.changes(v0, t.version).count() == 0


def test_cdf_exact_across_merge_with_fold(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.rebucket(32, lazy=True)
    v0 = t.version
    t.merge(
        _batch(spark, [1, 2], tag="u", ts=1).unionAll(
            _batch(spark, [7], op="D", ts=1)
        ),
        epoch_id="e1", order_cols=("ts",), drop_cols=(),
    )
    got = {
        (r["k"], r["_change_type"])
        for r in t.changes(v0, t.version).collect()
    }
    assert got == {(1, "U"), (2, "U"), (7, "D")}


def test_cdf_across_rescale_commit_is_empty(spark, tmp_path):
    t = _make(spark, tmp_path)
    v0 = t.version
    t.rebucket(32, lazy=True)
    # window crosses the spec change: full-diff fallback, zero rows
    assert t.changes(v0, t.version).count() == 0


# ------------------------------------------------- layout ops compose
def test_full_rebucket_completes_migration(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.rebucket(32, lazy=True)
    t.merge(_batch(spark, [1], tag="u", ts=1), epoch_id="e1",
            order_cols=("ts",), drop_cols=())
    before = _state(t)
    t.rebucket(16)  # full rewrite folds the overlay
    assert not t.legacy_pending and t.num_buckets == 16
    assert _state(t) == before


def test_rename_column_completes_migration(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.rebucket(32, lazy=True)
    before = _state(t)
    t.rename_column("v", "w")
    assert not t.legacy_pending
    got = {r["k"]: r["w"] for r in t.read().collect()}
    assert got == before


def test_schema_evolution_during_migration(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.rebucket(32, lazy=True)
    ev = spark.createDataFrame(
        [(1, "e_1", 5, "U", 9.5)],
        "k long, v string, ts long, op string, score double",
    )
    t.merge(ev, epoch_id="e1", order_cols=("ts",), drop_cols=())
    df = t.read()
    assert "score" in df.columns
    rows = {r["k"]: r["score"] for r in df.where("k in (1, 2)").collect()}
    assert rows[1] == 9.5 and rows[2] is None  # legacy row projects NULL


def test_row_lineage_survives_folds(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "lin"), SCHEMA, key_cols=["k"],
        num_buckets=8, row_lineage=True,
    )
    t.merge(_batch(spark, range(100)), epoch_id="seed",
            order_cols=("ts",), drop_cols=())
    ids0 = {
        r["k"]: r["__row_id"]
        for r in t.read(with_lineage=True).collect()
    }
    t.rebucket(32, lazy=True)
    t.merge(_batch(spark, [5], tag="u", ts=1), epoch_id="e1",
            order_cols=("ts",), drop_cols=())
    t.migrate_legacy()
    ids1 = {
        r["k"]: r["__row_id"]
        for r in t.read(with_lineage=True).collect()
    }
    assert ids1 == ids0  # physical moves never reassign row ids


# ------------------------------------------------ metadata machinery
def test_spilled_manifest_legacy_refs_roundtrip(spark, tmp_path):
    t = _make(spark, tmp_path, props={"metadata.spill-bytes": "0"})
    t.rebucket(32, lazy=True)
    raw = json.load(open(
        os.path.join(t.root, MANIFEST_DIR, f"v{t.version}.json")
    ))
    assert raw.get("legacy_refs"), "legacy map must spill to scl-*"
    assert "legacy_buckets" not in raw
    assert all(r.startswith("scl-") for r in raw["legacy_refs"].values())
    # fresh load hydrates the overlay and reads through it
    t2 = LakeTable.load(spark, t.root)
    assert t2.legacy_pending
    assert t2.read().count() == 400
    t2.merge(_batch(spark, [1], tag="u", ts=1), epoch_id="e1",
             order_cols=("ts",), drop_cols=())
    assert _state(t2)[1] == "u_1"
    while t2.legacy_pending:
        t2.migrate_legacy(max_buckets=4)
    raw = json.load(open(
        os.path.join(t2.root, MANIFEST_DIR, f"v{t2.version}.json")
    ))
    assert not raw.get("legacy_refs")


def test_clone_carries_overlay(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.rebucket(32, lazy=True)
    c = t.shallow_clone(str(tmp_path / "c"))
    assert c.legacy_pending and c.legacy_num_buckets == 8
    assert c.read().count() == 400
    # the clone migrates independently; the source is untouched
    c.migrate_legacy()
    assert not c.legacy_pending and t.legacy_pending
    assert _state(c) == _state(t)


def test_expire_and_orphans_keep_legacy_files(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.rebucket(32, lazy=True)
    t.merge(_batch(spark, [1], tag="u", ts=1), epoch_id="e1",
            order_cols=("ts",), drop_cols=())
    t.migrate_legacy(max_buckets=2)
    before = _state(t)
    t.expire_snapshots(keep_last=1)
    t.remove_orphans(grace_seconds=0)
    assert _state(t) == before
    assert t.read().count() == 400


def test_export_includes_legacy_files(spark, tmp_path):
    from haskell_dbfunctor_spark.lake.export import export_symlink_manifest

    t = _make(spark, tmp_path)
    t.rebucket(32, lazy=True)
    t.merge(_batch(spark, [1], tag="u", ts=1), epoch_id="e1",
            order_cols=("ts",), drop_cols=())
    res = export_symlink_manifest(t)
    listed = open(res["manifest"]).read().splitlines()
    raw = spark.read.parquet(*listed).select("k", "v", "ts")
    assert {r["k"]: r["v"] for r in raw.collect()} == _state(t)


def test_concurrent_merges_during_migration(spark, tmp_path):
    t = _make(spark, tmp_path, n=300)
    t.rebucket(32, lazy=True)
    errs = []

    def worker(lo, hi, tag):
        try:
            h = LakeTable.load(spark, t.root)
            h.merge(
                _batch(spark, range(lo, hi), tag=tag, ts=1),
                epoch_id=f"c_{tag}", order_cols=("ts",), drop_cols=(),
                conflict_retries=20,
            )
        except Exception as ex:  # pragma: no cover - surfaced below
            errs.append(ex)

    ts_ = [
        threading.Thread(target=worker, args=(0, 40, "x")),
        threading.Thread(target=worker, args=(40, 80, "y")),
    ]
    for th in ts_:
        th.start()
    for th in ts_:
        th.join()
    assert not errs, errs
    t.manifest = t._load_latest_published_manifest()
    st = _state(t)
    assert len(st) == 300
    assert all(st[i] == f"x_{i}" for i in range(0, 40))
    assert all(st[i] == f"y_{i}" for i in range(40, 80))
    assert all(st[i] == f"a_{i}" for i in range(80, 300))
