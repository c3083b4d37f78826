"""Write-audit-publish: stage_only commits, audit reads, publish /
abandon, and CDF lineage that never exposes staged state.

The Iceberg WAP loop on this manifest store: merge(stage_only=True)
claims real version numbers but load() resolves only PUBLISHED
snapshots; an auditor opens the staged version explicitly, validates,
then publish() fast-forwards (metadata-only) or walks away. Epoch
idempotence transfers atomically at publish. changes_since walks the
explicit parent chain, so an abandoned staged snapshot between two
published ones is invisible to CDF consumers.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.lake.table import (
    CommitConflict, LakeError, LakeTable,
)

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])


def _batch(spark, ks, tag):
    rows = [(int(k), f"{tag}{k}") for k in ks]
    df = spark.createDataFrame(rows, "k long, v string")
    return df.select(
        "k", "v",
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("k")).alias("ts"),
        F.lit("U").alias("op"), F.col("k").alias("seq"),
    )


def _state(table):
    return sorted(tuple(r) for r in table.read().select("k", "v").collect())


def _mk(spark, root):
    t = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=2)
    t.merge(_batch(spark, range(4), "pub"), epoch_id="e0")
    return t


def test_staged_invisible_until_published(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    pub_state = _state(t)
    st = t.merge(_batch(spark, [10, 11], "stg"), epoch_id="e1",
                 stage_only=True)
    assert not st.skipped
    # readers resolve the published head only
    fresh = LakeTable.load(spark, t.root)
    assert fresh.version == 1 and _state(fresh) == pub_state
    assert "e1" not in fresh.applied_epochs()
    # the auditor opens the staged snapshot explicitly
    audit = LakeTable.load(spark, t.root, st.version)
    assert dict(_state(audit))[10] == "stg10"
    # publish fast-forwards: state + epochs become visible atomically
    res = t.publish(st.version)
    assert res["published"]
    after = LakeTable.load(spark, t.root)
    assert "e1" in after.applied_epochs()
    assert dict(_state(after))[10] == "stg10" and len(_state(after)) == 6


def test_staged_chain_publishes_as_one(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    s1 = t.merge(_batch(spark, [10], "a"), epoch_id="s1", stage_only=True)
    s2 = t.merge(_batch(spark, [11], "b"), epoch_id="s2", stage_only=True)
    assert s2.version > s1.version
    assert LakeTable.load(spark, t.root).version == 1  # still hidden
    t.publish(s2.version)
    after = LakeTable.load(spark, t.root)
    got = dict(_state(after))
    assert got[10] == "a10" and got[11] == "b11"
    assert {"s1", "s2"} <= set(after.applied_epochs())


def test_abandoned_stage_never_leaks_into_cdf(spark, tmp_path):
    """published v1 -> staged v2 (abandoned) -> published v3: CDF from
    0 must walk 0 -> 1 -> 3 and never diff through the staged
    snapshot; a later merge's parent pointer must skip it too."""
    t = _mk(spark, str(tmp_path / "t"))                       # v1
    t.merge(_batch(spark, [99], "BAD"), epoch_id="bad", stage_only=True)
    t2 = LakeTable.load(spark, t.root)                        # published v1
    t2.merge(_batch(spark, [5], "good"), epoch_id="e2")       # v3 (v2 taken)
    assert t2.version == 3
    assert t2.manifest["parent"] == 1
    ch = t2.changes_since(0).select("k", "v", "_change_type",
                                    "_commit_version")
    rows = {(r["k"], r["_commit_version"]): r["v"] for r in ch.collect()}
    assert (99, 2) not in rows and all(k != 99 for k, _ in rows)
    assert rows[(5, 3)] == "good5"
    # the abandoned epoch never applied
    assert "bad" not in t2.applied_epochs()


def test_publish_conflict_when_published_chain_overlaps(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    st = t.merge(_batch(spark, [0], "stale"), epoch_id="s", stage_only=True)
    t2 = LakeTable.load(spark, t.root)
    t2.merge(_batch(spark, [0], "winner"), epoch_id="w")  # same key/bucket
    with pytest.raises(CommitConflict):
        LakeTable.load(spark, t.root, st.version)  # sanity: audit loads
        t.publish(st.version)
    # published state untouched by the failed publish
    assert dict(_state(LakeTable.load(spark, t.root)))[0] == "winner0"


def test_publish_rebases_over_disjoint_published_commits(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    by_bucket = {}
    for r in spark.range(40).select(
        F.col("id").alias("k"), t.bucket_of(F.col("id")).alias("b")
    ).collect():
        by_bucket.setdefault(r["b"], []).append(r["k"])
    assert len(by_bucket) == 2
    ka, kb = by_bucket[0][-1], by_bucket[1][-1]
    st = t.merge(_batch(spark, [ka], "stg"), epoch_id="s", stage_only=True)
    t2 = LakeTable.load(spark, t.root)
    t2.merge(_batch(spark, [kb], "pub2"), epoch_id="p2")  # other bucket
    res = t.publish(st.version)
    assert res["published"]
    got = dict(_state(LakeTable.load(spark, t.root)))
    assert got[ka] == f"stg{ka}" and got[kb] == f"pub2{kb}"


def test_staged_handle_blocks_unstaged_ops(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.merge(_batch(spark, [10], "s"), epoch_id="s1", stage_only=True)
    with pytest.raises(LakeError):
        t.merge(_batch(spark, [11], "x"), epoch_id="x")
    with pytest.raises(LakeError):
        t.compact()
    # staging more is fine, and publish unblocks
    t.merge(_batch(spark, [12], "s"), epoch_id="s2", stage_only=True)
    t.publish()
    t.merge(_batch(spark, [13], "x"), epoch_id="x")  # now allowed
    got = dict(_state(LakeTable.load(spark, t.root)))
    assert got[12] == "s12" and got[13] == "x13"


def test_expire_reclaims_abandoned_staged_files(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    st = t.merge(_batch(spark, [50], "junk"), epoch_id="j", stage_only=True)
    staged_files = [
        os.path.join(t.root, f)
        for fl in LakeTable.load(spark, t.root, st.version)
        .manifest["buckets"].values() for f in fl
    ]
    t2 = LakeTable.load(spark, t.root)
    t2.merge(_batch(spark, [5], "a"), epoch_id="a")
    t2.merge(_batch(spark, [6], "b"), epoch_id="b")
    t2.expire_snapshots(keep_last=2)
    meta = os.path.join(t.root, "metadata", f"v{st.version}.json")
    assert not os.path.exists(meta)
    # files written BY the staged commit (under its own unique snapshot
    # dir) are gone; files it carried by reference stay live for the
    # retained published snapshots
    marker = f"{os.sep}s{st.version}-"
    staged_own = [p for p in staged_files if marker in p]
    assert staged_own  # the staged merge did write files
    for p in staged_own:
        assert not os.path.exists(p)
    assert dict(_state(LakeTable.load(spark, t.root)))[5] == "a5"


def test_staged_claimer_does_not_mask_published_conflicts(spark, tmp_path):
    """Regression: version numbers are the published chain's conflict
    detector, so a stale writer must NOT skip past a published commit
    just because a staged snapshot also holds a number. Interleaving:
    published v1 (ea) -> staged v2 -> stale handle (forked at v1... at
    v0 here) merges: its CAS walk must rebase over the STAGED claimer
    but still observe the PUBLISHED commit ea — both epochs and both
    batches must survive."""
    root = str(tmp_path / "t")
    t1 = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=4)
    by_bucket = {}
    for r in spark.range(40).select(
        F.col("id").alias("k"), t1.bucket_of(F.col("id")).alias("b")
    ).collect():
        by_bucket.setdefault(r["b"], []).append(r["k"])
    bks = sorted(by_bucket)
    ka, kb = by_bucket[bks[0]][:2], by_bucket[bks[1]][:2]

    t2 = LakeTable.load(spark, root)               # forks at v0
    t1.merge(_batch(spark, ka, "a"), epoch_id="ea")          # published v1
    t1b = LakeTable.load(spark, root)
    t1b.merge(_batch(spark, [99], "stg"), epoch_id="es",
              stage_only=True)                               # staged v2
    st = t2.merge(_batch(spark, kb, "b"), epoch_id="eb")     # stale writer
    assert not st.skipped
    final = LakeTable.load(spark, root)
    assert {"ea", "eb"} <= set(final.applied_epochs())
    assert "es" not in final.applied_epochs()
    got = dict(_state(final))
    for k in ka:
        assert got[k] == f"a{k}"
    for k in kb:
        assert got[k] == f"b{k}"
    assert 99 not in got


def test_publish_preserves_concurrent_partial_markers(spark, tmp_path):
    """A partial-MoR commit published in a DISJOINT bucket while a
    chain is staged must keep its partial marker through the staged
    chain's publish — losing it would downgrade that bucket to the
    full-row collapse and corrupt the patched row."""
    root = str(tmp_path / "t")
    t1 = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=2)
    by_bucket = {}
    for r in spark.range(40).select(
        F.col("id").alias("k"), t1.bucket_of(F.col("id")).alias("b")
    ).collect():
        by_bucket.setdefault(r["b"], []).append(r["k"])
    ka, kb = by_bucket[0][0], by_bucket[1][0]
    t1.merge(_batch(spark, [ka, kb], "base"), epoch_id="e0")

    st = t1.merge(_batch(spark, [ka], "stg"), epoch_id="s",
                  stage_only=True)
    # concurrent publisher patches kb's v via partial MoR (other bucket)
    t2 = LakeTable.load(spark, root)
    patch = spark.createDataFrame([(int(kb), "patched")],
                                  "k long, v string").select(
        "k", "v", F.lit("U").alias("op"), F.lit(99).alias("seq"),
    )
    t2.merge(patch, epoch_id="p", mode="mor", partial=True)
    assert t1.publish(st.version)["published"]
    final = LakeTable.load(spark, root)
    assert final.manifest.get("partial_delta_files")  # marker survived
    got = dict(_state(final))
    assert got[kb] == "patched" and got[ka] == f"stg{ka}"


def test_mor_stage_and_publish(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    full = _batch(spark, [2], "mor")
    st = t.merge(full, epoch_id="m", mode="mor", stage_only=True)
    assert LakeTable.load(spark, t.root).manifest.get("delta_files", {}) == {}
    t.publish(st.version)
    after = LakeTable.load(spark, t.root)
    assert dict(_state(after))[2] == "mor2"
    assert sum(len(f) for f in after.manifest["delta_files"].values()) == 1


def test_branch_refs_stage_publish_and_survive_expiry(spark, tmp_path):
    """Iceberg-style branches over the WAP chain: merges to a branch
    are invisible to main readers, the ref advances per merge (and
    stays put on an epoch-idempotent replay), expire_snapshots pins
    the branch head + fork point, and fast_forward publishes the
    chain onto main — or conflicts if main advanced over the same
    buckets since the fork."""
    t = _mk(spark, str(tmp_path / "t"))
    pub_state = _state(t)
    # branch keys and the later main key must land in DISJOINT buckets
    # or fast_forward (correctly) conflicts — probe the bucket map
    probe = spark.range(10, 200).select(
        F.col("id").alias("k"), t.bucket_of(F.col("id")).alias("b")
    ).collect()
    by_bucket = {}
    for r in probe:
        by_bucket.setdefault(r.b, []).append(r.k)
    bks = sorted(by_bucket)
    k_br, k_main = by_bucket[bks[0]][:3], by_bucket[bks[1]][0]
    t.create_branch("audit")
    with pytest.raises(LakeError):
        t.create_branch("audit")  # duplicate name
    t.merge_to_branch("audit", _batch(spark, k_br[:2], "br"), epoch_id="b1")
    t.merge_to_branch("audit", _batch(spark, k_br[2:], "br"), epoch_id="b2")
    # invisible to main readers; visible on the branch
    assert _state(LakeTable.load(spark, t.root)) == pub_state
    br = t.checkout_branch("audit")
    br_st = _state(br)
    for k in k_br:
        assert (k, f"br{k}") in br_st
    # idempotent replay does not advance the ref
    head = t.branches()["audit"]
    t.merge_to_branch("audit", _batch(spark, k_br[:2], "br"), epoch_id="b1")
    assert t.branches()["audit"] == head
    # main advances on a DISJOINT bucket, then snapshots expire: the
    # branch head + fork point survive and the chain fast-forwards
    t.merge(_batch(spark, [k_main], "main"), epoch_id="m1")
    t.expire_snapshots(keep_last=1)
    res = t.fast_forward("audit")
    assert res["published"]
    st = _state(LakeTable.load(spark, t.root))
    for k in k_br:
        assert (k, f"br{k}") in st
    assert (k_main, f"main{k_main}") in st
    assert t.branches()["audit"] == res["version"]
    # second fast_forward is a no-op (head already published)
    assert t.fast_forward("audit")["published"] is False
    t.delete_branch("audit")
    with pytest.raises(LakeError):
        t.checkout_branch("audit")


def test_publish_race_with_concurrent_published_commit(spark, tmp_path):
    """Lost-update regression: a PUBLISHED commit landing between
    publish()'s head load and its version claim must collide on the
    CAS (publish claims exactly pub+1, never max-on-disk+1), forcing a
    reload + re-validation — the concurrent commit's bucket changes
    must survive into the published result."""
    t = _mk(spark, str(tmp_path / "t"))
    by_bucket = {}
    for r in spark.range(40).select(
        F.col("id").alias("k"), t.bucket_of(F.col("id")).alias("b")
    ).collect():
        by_bucket.setdefault(r["b"], []).append(r["k"])
    ka, kb = by_bucket[0][-1], by_bucket[1][-1]
    st = t.merge(_batch(spark, [ka], "stg"), epoch_id="s", stage_only=True)

    # inject the concurrent disjoint published commit at the worst
    # moment: after publish() loaded the head, right before its CAS
    real_commit = t._commit
    injected = {"done": False}

    def racing_commit(manifest):
        if not injected["done"]:
            injected["done"] = True
            t2 = LakeTable.load(spark, t.root)
            t2.merge(_batch(spark, [kb], "race"), epoch_id="race")
        return real_commit(manifest)

    t._commit = racing_commit
    try:
        res = t.publish(st.version)
    finally:
        t._commit = real_commit
    assert res["published"]
    got = dict(_state(LakeTable.load(spark, t.root)))
    # BOTH sides survive: the staged change AND the racing commit
    assert got[ka] == f"stg{ka}", "staged change lost"
    assert got[kb] == f"race{kb}", "concurrent published commit reverted"
    # and the racing epoch is still recorded (no applied_epochs revert)
    fresh = LakeTable.load(spark, t.root)
    assert "race" in fresh.manifest["applied_epochs"]
    assert "s" in fresh.manifest["applied_epochs"]


def test_publish_race_overlapping_commit_conflicts(spark, tmp_path):
    """Same race, but the concurrent published commit touches the SAME
    bucket as the staged chain: re-validation after the CAS collision
    must raise CommitConflict, never silently revert the winner."""
    t = _mk(spark, str(tmp_path / "t"))
    st = t.merge(_batch(spark, [0], "stg"), epoch_id="s", stage_only=True)
    real_commit = t._commit
    injected = {"done": False}

    def racing_commit(manifest):
        if not injected["done"]:
            injected["done"] = True
            t2 = LakeTable.load(spark, t.root)
            t2.merge(_batch(spark, [0], "race"), epoch_id="race")
        return real_commit(manifest)

    t._commit = racing_commit
    try:
        with pytest.raises(CommitConflict):
            t.publish(st.version)
    finally:
        t._commit = real_commit
    got = dict(_state(LakeTable.load(spark, t.root)))
    assert got[0] == "race0", "winner's update must survive"


def test_publish_preserves_concurrent_property_ddl(spark, tmp_path):
    """set_properties committed on the published chain after the stage
    fork must survive publish: staged chains can never change
    properties (forbidden on staged handles), so publish always takes
    the current head's."""
    t = _mk(spark, str(tmp_path / "t"))
    st = t.merge(_batch(spark, [10], "stg"), epoch_id="s",
                 stage_only=True)
    t2 = LakeTable.load(spark, t.root)
    t2.set_properties({"epochs.retention-count": "50"})
    res = t.publish(st.version)
    assert res["published"]
    fresh = LakeTable.load(spark, t.root)
    assert fresh.properties.get("epochs.retention-count") == "50", (
        "concurrent set_properties reverted by publish"
    )
