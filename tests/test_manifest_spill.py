"""Two-level manifest (Iceberg manifest-list analog): past the spill
threshold the per-bucket file listing + stats/blooms move to
content-addressed ``sc-*.json`` sidecars, so a commit writes O(touched
buckets) metadata instead of rewriting the whole listing. Readers
hydrate back to the inline shape; expire/gc collect dead sidecars."""

import json
import os
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.types as T
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.lake.table import (
    MANIFEST_DIR,
    LakeTable,
)

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
])

SPILL = {"metadata.spill-bytes": "0"}  # force two-level from commit 1


def _batch(spark, ids, v="v"):
    return spark.createDataFrame(
        [(i, f"{v}{i}") for i in ids], "k long, v string"
    )


def _make(spark, tmp_path, props=SPILL, n=32):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         key_cols=["k"], num_buckets=8, properties=props)
    t.merge(_batch(spark, range(n)), epoch_id="e0", op_col=None,
            order_cols=())
    return t


def _raw_manifest(t, v=None):
    v = t.version if v is None else v
    with open(os.path.join(t.root, MANIFEST_DIR, f"v{v}.json")) as fh:
        return json.load(fh)


def _sidecars(t):
    return {
        f for f in os.listdir(os.path.join(t.root, MANIFEST_DIR))
        if f.startswith("sc-") and f.endswith(".json")
    }


def test_spilled_manifest_shape_and_roundtrip(spark, tmp_path):
    t = _make(spark, tmp_path)
    raw = _raw_manifest(t)
    assert "buckets" not in raw and "file_stats" not in raw
    assert raw["metadata_spill"] is True
    assert raw["bucket_refs"] and all(
        r.startswith("sc-") for r in raw["bucket_refs"].values()
    )
    # reload hydrates to the inline shape and reads correctly
    t2 = LakeTable.load(spark, t.root)
    assert "buckets" in t2.manifest and "bucket_refs" not in t2.manifest
    assert {r.k for r in t2.read().collect()} == set(range(32))


def test_untouched_buckets_reuse_sidecars(spark, tmp_path):
    t = _make(spark, tmp_path)
    refs_v1 = _raw_manifest(t)["bucket_refs"]
    t.merge(_batch(spark, [0], v="w"), epoch_id="e1", op_col=None,
            order_cols=())
    refs_v2 = _raw_manifest(t)["bucket_refs"]
    changed = [b for b in refs_v1 if refs_v1[b] != refs_v2.get(b)]
    # a single-key merge touches exactly one bucket; the other 7
    # buckets' sidecars are reused byte-identically (content-addressed)
    assert len(changed) == 1
    assert t.read().where(F.col("k") == 0).collect()[0].v == "w0"


def test_default_threshold_stays_inline_when_small(spark, tmp_path):
    if os.environ.get("SPARK_GRAFT_META_SPILL_BYTES") == "0":
        pytest.skip("env forces spill; default-inline premise is void")
    t = _make(spark, tmp_path, props=None)
    raw = _raw_manifest(t)
    assert "bucket_refs" not in raw and "buckets" in raw


def test_spill_is_sticky(spark, tmp_path):
    t = _make(spark, tmp_path)
    # delete all but one key: table shrinks, but stays spilled
    t.merge(
        _batch(spark, range(1, 32)).withColumn("op", F.lit("D")),
        epoch_id="e1", op_col="op", order_cols=(),
    )
    assert "bucket_refs" in _raw_manifest(t)
    assert t.read().count() == 1


def test_changes_and_stats_blooms_hydrate(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.analyze(["k"])
    t.analyze_bloom(["k"])
    t.merge(_batch(spark, [3], v="w"), epoch_id="e1", op_col=None,
            order_cols=())
    assert "file_stats" in t.manifest and "file_blooms" in t.manifest
    # CDF across spilled snapshots
    cdf = t.changes(t.version - 1, t.version)
    assert cdf.count() == 1
    # stats/bloom-backed point read still correct after hydration
    assert t.read_where_eq("k", 3).collect()[0].v == "w3"


def test_mor_deltas_spill_and_collapse(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.merge(_batch(spark, [5], v="m"), epoch_id="mor1", mode="mor",
            op_col=None, order_cols=())
    raw = _raw_manifest(t)
    assert "delta_files" not in raw  # rides in the sidecars
    t2 = LakeTable.load(spark, t.root)
    assert t2.manifest.get("delta_files")
    assert t2.read().where(F.col("k") == 5).collect()[0].v == "m5"


def test_expire_collects_dead_sidecars(spark, tmp_path):
    t = _make(spark, tmp_path)
    for i in range(4):
        t.merge(_batch(spark, [i], v=f"e{i}"), epoch_id=f"u{i}",
                op_col=None, order_cols=())
    before = _sidecars(t)
    res = t.expire_snapshots(keep_last=1)
    assert res["expired_versions"]
    after = _sidecars(t)
    live = set(_raw_manifest(t)["bucket_refs"].values())
    assert live <= after
    assert after < before  # dead sidecars removed
    assert {r.k for r in t.read().collect()} == set(range(32))


def test_gc_orphans_sweeps_unreferenced_sidecars(spark, tmp_path):
    t = _make(spark, tmp_path)
    meta = os.path.join(t.root, MANIFEST_DIR)
    orphan = os.path.join(meta, "sc-deadbeefdeadbeefdead.json")
    with open(orphan, "w") as fh:
        json.dump({"files": ["data/nope.parquet"]}, fh)
    os.utime(orphan, (time.time() - 7200, time.time() - 7200))
    live_before = set(_raw_manifest(t)["bucket_refs"].values())
    t.remove_orphans(grace_seconds=3600)
    left = _sidecars(t)
    assert os.path.basename(orphan) not in left
    assert live_before <= left  # referenced sidecars untouched


def test_wap_publish_on_spilled_table(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.merge(_batch(spark, [7], v="staged"), epoch_id="s1",
            op_col=None, order_cols=(), stage_only=True)
    t.publish()
    t2 = LakeTable.load(spark, t.root)
    assert t2.read().where(F.col("k") == 7).collect()[0].v == "staged7"


def test_rebase_conflict_path_on_spilled_table(spark, tmp_path):
    t = _make(spark, tmp_path)
    stale = LakeTable.load(spark, t.root)
    t.merge(_batch(spark, [1], v="a"), epoch_id="w1", op_col=None,
            order_cols=())
    # stale handle commits after a foreign commit on a DIFFERENT key:
    # the CAS fails, the rebase hydrates the latest spilled manifest
    stale.merge(_batch(spark, [2], v="b"), epoch_id="w2", op_col=None,
                order_cols=())
    final = LakeTable.load(spark, t.root)
    got = {r.k: r.v for r in final.read().collect()}
    assert got[1] == "a1" and got[2] == "b2"


def test_epoch_retention_bounds_applied_epochs(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "r"), SCHEMA, key_cols=["k"], num_buckets=4,
        properties={"epochs.retention-count": "3"},
    )
    for i in range(6):
        t.merge(_batch(spark, [i]), epoch_id=f"e{i}", op_col=None,
                order_cols=())
    applied = t.manifest["applied_epochs"]
    assert set(applied) == {"e3", "e4", "e5"}
    assert t.manifest["epochs_pruned"] == 3
    # a RETAINED epoch re-delivered is still an exactly-once no-op
    v = t.version
    res = t.merge(_batch(spark, [4], v="dup"), epoch_id="e4",
                  op_col=None, order_cols=())
    assert res.skipped and t.version == v
    assert t.read().where(F.col("k") == 4).collect()[0].v == "v4"
    # a PRUNED epoch re-delivered re-applies (the documented contract:
    # retention must exceed the maximum replay window)
    res = t.merge(_batch(spark, [0], v="re"), epoch_id="e0",
                  op_col=None, order_cols=())
    assert not res.skipped and t.version == v + 1


def test_parallel_hydration_many_buckets(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "p"), SCHEMA, key_cols=["k"],
        num_buckets=128, properties=SPILL,
    )
    t.merge(_batch(spark, range(400)), epoch_id="e0", op_col=None,
            order_cols=())
    assert len(_raw_manifest(t)["bucket_refs"]) >= 64  # pool path
    t2 = LakeTable.load(spark, t.root)
    assert t2.read().count() == 400
    assert {r.k for r in t2.read().where(F.col("k") < 5).collect()} \
        == set(range(5))


def test_expire_prune_lineage(spark, tmp_path):
    t = _make(spark, tmp_path, props=None)
    for i in range(3):
        t.merge(_batch(spark, [i], v=f"l{i}"), epoch_id=f"L{i}",
                op_col=None, order_cols=())
    lin = os.path.join(t.root, "lineage")
    n_before = len(os.listdir(lin))
    res = t.expire_snapshots(keep_last=1, prune_lineage=True)
    left = {f for f in os.listdir(lin)}
    assert len(left) < n_before
    for v in res["expired_versions"]:
        assert f"commit-{v}.json" not in left
    assert t.metrics().count() == len(left)


def test_compact_max_buckets_budget(spark, tmp_path):
    t = _make(spark, tmp_path, props=None)
    # fragment buckets with MoR delta merges (CoW rewrites don't
    # fragment: a touched bucket's files are replaced, not appended)
    for i in range(16):
        t.merge(_batch(spark, [i], v=f"f{i}"), epoch_id=f"frag{i}",
                mode="mor", op_col=None, order_cols=())
    dm = t.manifest.get("delta_files", {})
    frag = {
        b: len(t.manifest["buckets"].get(b, [])) + len(fs)
        for b, fs in dm.items()
    }
    assert len(frag) > 2
    res = t.compact(max_buckets=2)
    assert res["buckets_compacted"] == 2
    # the two worst (most-fragmented) buckets got picked and folded
    worst = sorted(frag, key=lambda b: (-frag[b], int(b)))[:2]
    after_dm = t.manifest.get("delta_files", {})
    assert all(not after_dm.get(b) for b in worst)
    assert t.read().count() == 32
    # repeated budgeted cycles converge to fully compacted
    while t.compact(max_buckets=2)["buckets_compacted"]:
        pass
    assert not t.manifest.get("delta_files", {})
    assert all(len(fs) == 1 for fs in t.manifest["buckets"].values())
    got = {r.k: r.v for r in t.read().collect()}
    assert got[3] == "f33" and got[20] == "v20"


def test_lazy_bloom_sidecars(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.analyze_bloom(["k"])
    raw = _raw_manifest(t)
    assert raw.get("bloom_refs") and all(
        r.startswith("scb-") for r in raw["bloom_refs"].values()
    )
    assert "file_blooms" not in raw
    # a fresh load does NOT hydrate bloom bytes (lazy)
    t2 = LakeTable.load(spark, t.root)
    assert "file_blooms" not in t2.manifest
    # point lookup with bucket pruning loads ONLY that bucket's
    # bloom sidecar (lazy per-bucket hydration)
    b3 = spark.range(1).select(
        t2.bucket_of(F.lit(3).cast("long")).alias("b")
    ).collect()[0].b
    assert t2.read_where_eq("k", 3, buckets=[b3]).collect()[0].v == "v3"
    loaded_refs = set(getattr(t2, "_bloom_cache", {}))
    assert 0 < len(loaded_refs) < len(raw["bloom_refs"])
    # a later merge carries bloom refs forward; rewritten files simply
    # have no entry (read, never wrongly skipped)
    t2.merge(_batch(spark, [3], v="w"), epoch_id="e9", op_col=None,
             order_cols=())
    assert t2.read_where_eq("k", 3).collect()[0].v == "w3"
    # expire collects scb sidecars referenced only by expired manifests
    for i in range(3):
        t2.analyze_bloom(["k"])
        t2.merge(_batch(spark, [i], v=f"x{i}"), epoch_id=f"x{i}",
                 op_col=None, order_cols=())
    t2.expire_snapshots(keep_last=1)
    live = set(_raw_manifest(t2).get("bloom_refs", {}).values())
    on_disk = {
        f for f in os.listdir(os.path.join(t2.root, MANIFEST_DIR))
        if f.startswith("scb-")
    }
    assert live <= on_disk


def test_history_and_snapshots_df_on_spilled_table(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.merge(_batch(spark, [1], v="w"), epoch_id="e1", mode="mor",
            op_col=None, order_cols=())
    hist = LakeTable.history(t.root)
    assert [h["version"] for h in hist] == [0, 1, 2]
    # refs-aware bucket count: data-bearing buckets, not zero
    assert hist[-1]["n_buckets_with_data"] > 0
    rows = {r.version: r for r in t.snapshots_df().collect()}
    assert rows[2].n_delta_files >= 1  # hydrated counts, not refs


def test_maintain_method_cycle(spark, tmp_path):
    t = _make(spark, tmp_path)
    for i in range(4):
        t.merge(_batch(spark, [i], v=f"m{i}"), epoch_id=f"m{i}",
                mode="mor", op_col=None, order_cols=())
    res = t.maintain(max_buckets=2, keep_last=1, prune_lineage=True,
                     grace_seconds=0)
    assert res["compact"]["buckets_compacted"] == 2
    assert res["expire"]["expired_versions"]
    assert t.read().count() == 32


def test_lazy_stats_sidecars(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.analyze(["k"])
    raw = _raw_manifest(t)
    assert raw.get("stats_refs") and all(
        r.startswith("scs-") for r in raw["stats_refs"].values()
    )
    assert "file_stats" not in raw
    # sc-* bucket sidecars carry the file listing ONLY — zero stats
    # bytes ride the mandatory load path
    meta_dir = os.path.join(t.root, MANIFEST_DIR)
    for ref in raw["bucket_refs"].values():
        with open(os.path.join(meta_dir, ref)) as fh:
            assert "file_stats" not in json.load(fh)
    # a fresh load does NOT hydrate stats (lazy) and a plain read
    # touches no scs sidecar at all
    t2 = LakeTable.load(spark, t.root)
    assert "file_stats" not in t2.manifest
    assert t2.read().count() == 32
    assert not getattr(t2, "_stats_cache", {})
    # bounded read over a bucket subset loads ONLY those buckets'
    # stats sidecars, and still prunes
    some = [int(b) for b in sorted(raw["stats_refs"])[:2]]
    t2.read_where("k", 10**6, None, buckets=some).count()
    assert t2.last_pruned_files > 0
    loaded = set(getattr(t2, "_stats_cache", {}))
    assert 0 < len(loaded) <= 2
    # full-range read_where remains correct under spill
    t3 = LakeTable.load(spark, t.root)
    got = sorted(r["k"] for r in t3.read_where("k", 5, 7).collect())
    assert got == [5, 6, 7]
    # a later merge carries stats refs forward; rewritten files simply
    # have no live entry (read, never wrongly skipped)
    t3.merge(_batch(spark, [5], v="w"), epoch_id="e9", op_col=None,
             order_cols=())
    got = {r["k"]: r["v"] for r in t3.read_where("k", 5, 7).collect()}
    assert got == {5: "w5", 6: "v6", 7: "v7"}
    # expire collects scs sidecars referenced only by expired manifests
    for i in range(3):
        t3.analyze(["k"])
        t3.merge(_batch(spark, [i], v=f"x{i}"), epoch_id=f"x{i}",
                 op_col=None, order_cols=())
    t3.expire_snapshots(keep_last=1)
    live = set(_raw_manifest(t3).get("stats_refs", {}).values())
    on_disk = {
        f for f in os.listdir(os.path.join(t3.root, MANIFEST_DIR))
        if f.startswith("scs-")
    }
    assert live <= on_disk
