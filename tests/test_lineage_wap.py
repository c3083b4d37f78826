"""Row lineage x write-audit-publish (VERDICT r04 item 3): staged
chains on row_lineage=True tables CAS-claim a disjoint row-id
reservation block (metadata/rowres-K.json) at chain start and
allocate inside it, so fork sides (and main) can never hand out the
same __row_id. Publish strips the block and keeps main's organic
high-water mark; validation uses the standard bucket-overlap rule
(the lineage always-conflict exists only to serialize same-space
allocators, which reserved chains are not). forget_keys consequently
works on lineage tables — its staged transaction is the WAP path.
"""

import os
import shutil
import sys
import uuid

import pytest
from pyspark.sql import functions as F, types as T

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from haskell_dbfunctor_spark.lake.table import (  # noqa: E402
    ROW_ID_RES_BASE,
    ROW_ID_COL,
    CommitConflict,
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
    d = str(tmp_path / f"lw_{uuid.uuid4().hex[:6]}")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, ts long, op string")


def _make(spark, root, n=10):
    t = LakeTable.create(
        spark, root, SCHEMA, ["k"], num_buckets=4, row_lineage=True
    )
    t.merge(
        _batch(spark, [(i, f"a{i}", 1, "U") for i in range(n)]),
        epoch_id="e1", order_cols=("ts",), drop_cols=(),
    )
    return t


def _ids(t):
    return {
        r["k"]: r[ROW_ID_COL]
        for r in t.read(with_lineage=True).collect()
    }


def test_staged_chain_publish_cow(spark, root):
    t = _make(spark, root)
    before = _ids(t)
    organic_next = t.manifest["next_row_id"]
    # chain: one update (keeps id) + inserts (block ids), two commits
    st1 = t.merge(
        _batch(spark, [(1, "z1", 9, "U"), (100, "n", 9, "U")]),
        stage_only=True, order_cols=("ts",), drop_cols=(),
    )
    res = t.manifest["lineage_reservation"]
    assert res["start"] == ROW_ID_RES_BASE
    st2 = t.merge(
        _batch(spark, [(101, "m", 9, "U")]),
        stage_only=True, order_cols=("ts",), drop_cols=(),
    )
    assert st2.version > st1.version
    # same chain, same block (claimed once)
    assert t.manifest["lineage_reservation"] == res
    assert os.path.exists(
        os.path.join(root, "metadata", "rowres-0.json")
    )
    # invisible to main until publish
    main = LakeTable.load(spark, root)
    assert 100 not in _ids(main)
    staged_ids = _ids(t)
    assert staged_ids[1] == before[1]  # matched keeps organic id
    assert staged_ids[100] >= res["start"] < staged_ids[101]
    out = t.publish()
    assert out["published"]
    pub = LakeTable.load(spark, root)
    got = _ids(pub)
    assert got == staged_ids
    assert len(set(got.values())) == len(got)  # unique
    # organic high-water mark survives (no jump into block space)
    assert pub.manifest["next_row_id"] == organic_next
    assert "lineage_reservation" not in pub.manifest


def test_disjoint_main_commit_publishes(spark, root):
    t = _make(spark, root, n=20)
    fork_ids = _ids(t)
    t.merge(
        _batch(spark, [(200, "s", 9, "U")]),
        stage_only=True, order_cols=("ts",), drop_cols=(),
    )
    # main inserts a key in a bucket the chain did NOT touch
    main = LakeTable.load(spark, root)
    chain_buckets = {
        b for b in t.manifest["buckets"]
        if t.manifest["buckets"][b]
        != main.manifest["buckets"].get(b, [])
    }
    probe = next(
        k for k in range(300, 400)
        if str(_bucket_of(main, k)) not in chain_buckets
    )
    main.merge(
        _batch(spark, [(probe, "mm", 9, "U")]),
        epoch_id="e-main", order_cols=("ts",), drop_cols=(),
    )
    out = t.publish()
    assert out["published"]
    pub = LakeTable.load(spark, root)
    got = _ids(pub)
    assert got[probe] is not None and got[200] >= ROW_ID_RES_BASE
    assert len(set(got.values())) == len(got)
    for k, rid in fork_ids.items():
        assert got[k] == rid


def _bucket_of(t, k):
    return t.spark.range(1).select(
        t.bucket_of(F.lit(k).cast("long")).alias("b")
    ).first()["b"]


def test_overlapping_main_commit_conflicts(spark, root):
    t = _make(spark, root)
    t.merge(
        _batch(spark, [(1, "st", 9, "U")]),
        stage_only=True, order_cols=("ts",), drop_cols=(),
    )
    main = LakeTable.load(spark, root)
    main.merge(
        _batch(spark, [(1, "mn", 9, "U")]),
        epoch_id="e-main", order_cols=("ts",), drop_cols=(),
    )
    with pytest.raises(CommitConflict):
        t.publish()


def test_sibling_chains_disjoint_blocks(spark, root):
    t = _make(spark, root)
    a = LakeTable.load(spark, root)
    b = LakeTable.load(spark, root)
    a.merge(
        _batch(spark, [(500, "a", 9, "U")]),
        stage_only=True, order_cols=("ts",), drop_cols=(),
    )
    b.merge(
        _batch(spark, [(600, "b", 9, "U")]),
        stage_only=True, order_cols=("ts",), drop_cols=(),
    )
    ra, rb = (
        a.manifest["lineage_reservation"],
        b.manifest["lineage_reservation"],
    )
    assert ra["end"] <= rb["start"] or rb["end"] <= ra["start"]
    ids_a = {r[ROW_ID_COL] for r in a.read(with_lineage=True).collect()}
    ids_b = {r[ROW_ID_COL] for r in b.read(with_lineage=True).collect()}
    assert not (
        {i for i in ids_a if i >= ROW_ID_RES_BASE}
        & {i for i in ids_b if i >= ROW_ID_RES_BASE}
    )


def test_staged_mor_chain_publish(spark, root):
    t = _make(spark, root)
    before = _ids(t)
    t.merge(
        _batch(spark, [(2, "z2", 9, "U"), (700, "n7", 9, "U")]),
        mode="mor", stage_only=True, order_cols=("ts",), drop_cols=(),
    )
    res = t.manifest["lineage_reservation"]
    staged_ids = _ids(t)  # collapse resolves through the staged deltas
    assert staged_ids[2] == before[2]
    assert staged_ids[700] >= res["start"]
    t.publish()
    pub = LakeTable.load(spark, root)
    assert _ids(pub) == staged_ids
    pub.compact_deltas()
    assert _ids(pub) == staged_ids  # fold materializes the same ids


def test_mor_update_of_block_id_row_keeps_id(spark, root):
    """The earliest-image collapse rule (not min-id): a row whose
    base id came from a WAP reservation block (HIGH space) updated by
    a later ORGANIC MoR delta (LOW provisional id) must keep the base
    id."""
    t = _make(spark, root)
    t.merge(
        _batch(spark, [(800, "w", 9, "U")]),
        stage_only=True, order_cols=("ts",), drop_cols=(),
    )
    t.publish()
    pub = LakeTable.load(spark, root)
    high = _ids(pub)[800]
    assert high >= ROW_ID_RES_BASE
    pub.merge(
        _batch(spark, [(800, "w2", 10, "U")]),
        epoch_id="e-up", mode="mor", order_cols=("ts",), drop_cols=(),
    )
    assert _ids(pub)[800] == high  # base id survives the update
    # delete + reinsert still mints a fresh id
    pub.merge(
        _batch(spark, [(800, "w2", 11, "D")]),
        epoch_id="e-del", mode="mor", order_cols=("ts",), drop_cols=(),
    )
    pub.merge(
        _batch(spark, [(800, "w3", 12, "U")]),
        epoch_id="e-re", mode="mor", order_cols=("ts",), drop_cols=(),
    )
    assert _ids(pub)[800] != high


def test_reservation_exhaustion_fails_loud(spark, root, monkeypatch):
    import haskell_dbfunctor_spark.lake.table as tb

    t = _make(spark, root, n=4)
    monkeypatch.setattr(tb, "ROW_ID_RES_BLOCK", 64)
    with pytest.raises(LakeError, match="exhausted its row-id"):
        t.merge(
            _batch(spark, [(i, "x", 9, "U") for i in range(900, 1100)]),
            stage_only=True, order_cols=("ts",), drop_cols=(),
        )


def test_txn_replay_rollup_on_lineage_table(spark, tmp_path):
    """The production unlock: cdc_ingest --rollup-root + --row-lineage
    together — the transactional per-epoch state+rollup commit stages
    through WAP, which lineage tables refused before round 5. Each
    epoch's staged chain claims its own reservation block; final state
    matches a plain replay, ids are unique and organic rows stay below
    the reservation base, and the rollup recounts exactly."""
    import os as _os

    from haskell_dbfunctor_spark.cdc.apply import (
        open_or_create_rollup, open_or_create_transcripts, replay,
    )
    from haskell_dbfunctor_spark.cdc.generator import change_feed
    from haskell_dbfunctor_spark.lake.transaction import Catalog

    feed = change_feed(spark, 2000, seed=7, n_convs=25, n_epochs=3)
    state = open_or_create_transcripts(
        spark, str(tmp_path / "state"), num_buckets=4, row_lineage=True
    )
    rollup = open_or_create_rollup(
        spark, str(tmp_path / "rollup"), ["role"]
    )
    cat = Catalog(spark, str(tmp_path / "_cat"))
    st = replay(state, feed, 3, catalog=cat, rollup=rollup)
    assert st.epochs_applied == 3
    state.manifest = state._load_latest_published_manifest()
    plain = open_or_create_transcripts(
        spark, str(tmp_path / "plain"), num_buckets=4
    )
    replay(plain, feed, 3)
    key = ["conv_id", "turn_idx"]
    got = {
        tuple(r[k] for k in key): r["text"]
        for r in state.read().collect()
    }
    want = {
        tuple(r[k] for k in key): r["text"]
        for r in plain.read().collect()
    }
    assert got == want and got
    lin = state.read(with_lineage=True).select(ROW_ID_COL).collect()
    ids = [r[ROW_ID_COL] for r in lin]
    assert len(set(ids)) == len(ids)
    # one reservation block per epoch's staged chain
    blocks = [
        f for f in _os.listdir(_os.path.join(state.root, "metadata"))
        if f.startswith("rowres-")
    ]
    assert len(blocks) == 3
    rollup.manifest = rollup._load_latest_published_manifest()
    roll = {
        r["role"]: r["live_rows"]
        for r in rollup.read().collect() if r["live_rows"]
    }
    want_roll = {
        r["role"]: r["n"]
        for r in state.read().groupBy("role")
        .agg(F.count("*").alias("n")).collect()
    }
    assert roll == want_roll
    # idempotent re-apply
    st2 = replay(state, feed, 3, catalog=cat, rollup=rollup)
    assert st2.epochs_applied == 0


def test_forget_on_lineage_table(spark, root, tmp_path):
    from haskell_dbfunctor_spark.lake.forget import forget_keys
    from haskell_dbfunctor_spark.lake.transaction import Catalog

    cat = Catalog(spark, str(tmp_path / "cat"))
    t = _make(spark, root, n=12)
    before = _ids(t)
    probe = spark.createDataFrame([(3,), (7,)], "k long")
    out = forget_keys(cat, t, probe, order_cols=("ts",))
    assert out["matched"] == 2 and not out["skipped"]
    t.manifest = t._load_latest_published_manifest()
    got = _ids(t)
    assert 3 not in got and 7 not in got
    for k, rid in before.items():
        if k not in (3, 7):
            assert got[k] == rid  # survivors keep their ids
    # idempotent re-run matches nothing
    out2 = forget_keys(cat, t, probe, order_cols=("ts",))
    assert out2["matched"] == 0 and out2["skipped"]
    # purge path: physical erasure works on the lineage table too
    probe2 = spark.createDataFrame([(5,)], "k long")
    out3 = forget_keys(
        cat, t, probe2, order_cols=("ts",), purge=True
    )
    assert len(out3["purged"]["state"]["expired_versions"]) >= 1
    t.manifest = t._load_latest_published_manifest()
    assert 5 not in _ids(t)
