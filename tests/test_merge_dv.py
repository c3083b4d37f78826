"""Deletion-vector MERGE (merge(mode="dv")): O(batch) writes for
scattered updates — matched positions vector out, surviving images
append as plain base files. Contracts pinned here:

- final state is BIT-EQUAL to the same merge with mode="cow"
  (inserts, updates, deletes, matched_filter, schema evolution);
- base files are NEVER rewritten — the pre-merge file rels all
  survive into the new snapshot (appends + dv refs only);
- sequential dv merges supersede earlier APPENDED images too;
- matched_filter (cross-batch LWW) evaluates — the capability MoR
  structurally lacks;
- prune_files composes: provably key-disjoint files are excluded
  from the match scan;
- compact(dv_ratio=0.0) folds vectors back into the base unchanged;
- CDF across a dv merge equals the CoW merge's CDF;
- refusals: pending-MoR-delta buckets, nullable_keys, update_cols,
  stage_only, row_lineage.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest
from pyspark.sql import functions as F, types as T

from haskell_dbfunctor_spark.lake.table import LakeError, LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("ts", T.LongType(), True),
    ]
)


def _batch(spark, rows):
    """rows: (conv_id, turn_idx, text, ts, op)"""
    return spark.createDataFrame(
        [(c, t, x, ts, o) for c, t, x, ts, o in rows],
        "conv_id string, turn_idx int, text string, ts long, op string",
    ).withColumn("seq", F.col("ts"))


def _mk(spark, root, **kw):
    return LakeTable.create(
        spark, str(root), SCHEMA, key_cols=["conv_id", "turn_idx"],
        num_buckets=4, **kw,
    )


def _seed_rows(n=60, ts=1):
    return [(f"c{i:03d}", i % 5, f"text-{i}", ts, "I") for i in range(n)]


def _rows(t):
    return sorted(map(tuple, t.read().collect()))


MIXED = [
    ("c003", 3, "updated-3", 9, "U"),
    ("c017", 2, "updated-17", 9, "U"),
    ("c008", 3, None, 9, "D"),
    ("new1", 0, "brand-new-1", 9, "I"),
    ("new2", 1, "brand-new-2", 9, "I"),
    ("zzzz", 0, None, 9, "D"),  # delete of an absent key: no-op
]


def _pair(spark, tmp_path, **create_kw):
    a = _mk(spark, tmp_path / "dv", **create_kw)
    b = _mk(spark, tmp_path / "cow", **create_kw)
    for t in (a, b):
        t.merge(_batch(spark, _seed_rows()), epoch_id="seed")
    return a, b


def test_mixed_batch_matches_cow_and_never_rewrites(spark, tmp_path):
    a, b = _pair(spark, tmp_path)
    before = {
        bb: list(fl) for bb, fl in a.manifest["buckets"].items()
    }
    sa = a.merge(_batch(spark, MIXED), epoch_id="mix", mode="dv")
    b.merge(_batch(spark, MIXED), epoch_id="mix")
    assert _rows(a) == _rows(b)
    assert sa.extra["mode"] == "dv"
    assert sa.extra["dv_positions"] == 3  # 2 updates + 1 real delete
    assert sa.extra["rows_appended"] == 4  # 2 updates + 2 inserts
    after = a.manifest["buckets"]
    for bb, fl in before.items():
        assert set(fl) <= set(after.get(bb, [])), "a base file was dropped"
    assert a.manifest.get("dv_files")


def test_sequential_dv_merges_supersede_appended_images(spark, tmp_path):
    a, b = _pair(spark, tmp_path)
    for i, eid in enumerate(["m1", "m2", "m3"]):
        batch = _batch(spark, [("c003", 3, f"gen-{i}", 10 + i, "U")])
        a.merge(batch, epoch_id=eid, mode="dv")
        b.merge(batch, epoch_id=eid)
    assert _rows(a) == _rows(b)
    got = a.read().where("conv_id = 'c003' and turn_idx = 3").collect()
    assert len(got) == 1 and got[0].text == "gen-2"


def test_matched_filter_cross_batch_lww(spark, tmp_path):
    """a LATE batch (older ts) must not override newer committed
    state — the tailer's lww_matched_filter works under dv mode
    (MoR refuses this combination structurally)."""
    from haskell_dbfunctor_spark.streaming.tailer import lww_matched_filter

    a, b = _pair(spark, tmp_path)
    late = _batch(spark, [
        ("c003", 3, "stale-image", 0, "U"),   # ts=0 < seeded ts=1
        ("c004", 4, "fresh-image", 7, "U"),
    ])
    mf = lww_matched_filter(("ts",))
    sa = a.merge(late, epoch_id="late", mode="dv", matched_filter=mf)
    b.merge(late, epoch_id="late", matched_filter=mf)
    assert _rows(a) == _rows(b)
    keep = a.read().where("conv_id = 'c003' and turn_idx = 3").first()
    assert keep.text == "text-3"  # stale image vetoed
    assert sa.extra["dv_positions"] == 1  # only the fresh update


def test_schema_evolution_matched_keeps_target_value(spark, tmp_path):
    """an evolved batch carrying a NEW column merges; a narrow batch
    NOT carrying an existing column keeps the target's value in the
    appended image (CoW parity)."""
    a, b = _pair(spark, tmp_path)
    wide = _batch(spark, [("c001", 1, "with-tool", 9, "U")]).withColumn(
        "tool", F.lit("bash")
    )
    a.merge(wide, epoch_id="wide", mode="dv")
    b.merge(wide, epoch_id="wide")
    assert "tool" in a.schema.names
    narrow = spark.createDataFrame(
        [("c001", 1, "narrower", 10, "U")],
        "conv_id string, turn_idx int, text string, ts long, op string",
    ).withColumn("seq", F.col("ts"))
    a.merge(narrow, epoch_id="narrow", mode="dv")
    b.merge(narrow, epoch_id="narrow")
    assert _rows(a) == _rows(b)
    got = a.read().where("conv_id = 'c001' and turn_idx = 1").first()
    assert got.text == "narrower" and got.tool == "bash"


def test_epoch_idempotence_and_concurrent_reader(spark, tmp_path):
    a, _ = _pair(spark, tmp_path)
    old = LakeTable.load(spark, a.root)  # snapshot-isolated reader
    before = _rows(a)
    a.merge(_batch(spark, MIXED), epoch_id="mix", mode="dv")
    st = a.merge(_batch(spark, MIXED), epoch_id="mix", mode="dv")
    assert st.skipped
    assert _rows(old) == before  # old snapshot unaffected


def test_prune_files_skips_scan_with_blooms(spark, tmp_path):
    t = _mk(spark, tmp_path / "t",
            properties={"bloom.auto-columns": "conv_id",
                        "stats.auto-columns": "conv_id"})
    t.merge(_batch(spark, _seed_rows(200)), epoch_id="seed")
    ins = _batch(spark, [
        (f"zz{i:03d}", 0, f"new-{i}", 9, "I") for i in range(50)
    ])
    st = t.merge(ins, epoch_id="ins", mode="dv", prune_files=True)
    assert st.extra["files_skipped"] > 0
    assert st.extra["dv_positions"] == 0
    assert t.read().count() == 250


def test_compact_folds_dvs_back(spark, tmp_path):
    a, b = _pair(spark, tmp_path)
    a.merge(_batch(spark, MIXED), epoch_id="mix", mode="dv")
    b.merge(_batch(spark, MIXED), epoch_id="mix")
    before = _rows(a)
    a.compact(dv_ratio=0.0, min_files=1)
    assert not any(a.manifest.get("dv_files", {}).values())
    assert _rows(a) == before == _rows(b)


def test_cdf_across_dv_merge_matches_cow(spark, tmp_path):
    a, b = _pair(spark, tmp_path)
    v = a.version
    a.merge(_batch(spark, MIXED), epoch_id="mix", mode="dv")
    b.merge(_batch(spark, MIXED), epoch_id="mix")
    ca = sorted(
        map(tuple, a.changes(v).select(
            "conv_id", "turn_idx", "text", "ts", "_change_type"
        ).collect())
    )
    cb = sorted(
        map(tuple, b.changes(v).select(
            "conv_id", "turn_idx", "text", "ts", "_change_type"
        ).collect())
    )
    assert ca == cb and len(ca) == 5  # 2 U + 1 D + 2 I


def test_replay_dv_matches_cow_end_to_end(spark, tmp_path):
    """The full CDC replay path (cdc.apply.replay) in dv mode: same
    final state as CoW replay, including schema evolution mid-stream,
    resume-from-checkpoint idempotence, and the --compact-every DV
    fold."""
    from haskell_dbfunctor_spark.cdc.apply import (
        open_or_create_transcripts, replay,
    )
    from haskell_dbfunctor_spark.cdc.generator import change_feed

    feed = change_feed(
        spark, 3000, n_convs=50, max_turns=20, n_epochs=4,
        evolution_epoch=2,
    ).persist()
    feed.count()
    a = open_or_create_transcripts(spark, str(tmp_path / "dv"),
                                   num_buckets=4)
    b = open_or_create_transcripts(spark, str(tmp_path / "cow"),
                                   num_buckets=4)
    st = replay(a, feed, 4, evolution_epoch=2, mode="dv",
                compact_every=2)
    replay(b, feed, 4, evolution_epoch=2)
    assert st.epochs_applied == 4
    assert _rows(a) == _rows(b)
    # resume: re-running skips every committed epoch
    st2 = replay(a, feed, 4, evolution_epoch=2, mode="dv")
    assert st2.epochs_applied == 0 and st2.epochs_skipped == 4
    feed.unpersist()


def test_refusals(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.merge(_batch(spark, _seed_rows()), epoch_id="seed")
    with pytest.raises(LakeError, match="update_cols"):
        t.merge(_batch(spark, MIXED), mode="dv", update_cols=["text"])
    with pytest.raises(LakeError, match="staging"):
        t.merge(_batch(spark, MIXED), mode="dv", stage_only=True)
    with pytest.raises(LakeError, match="not_matched_by_source"):
        t.merge(_batch(spark, MIXED), mode="dv",
                not_matched_by_source="delete")
    # pending MoR deltas refuse position merges
    t.merge(_batch(spark, [("c001", 1, "delta", 8, "U")]),
            epoch_id="mor1", mode="mor")
    with pytest.raises(LakeError, match="compact_deltas"):
        t.merge(_batch(spark, MIXED), mode="dv")
    t.compact_deltas()
    st = t.merge(_batch(spark, MIXED), epoch_id="mix", mode="dv")
    assert st.extra["mode"] == "dv"

    nk = LakeTable.create(
        spark, str(tmp_path / "nk"), SCHEMA,
        key_cols=["conv_id", "turn_idx"], num_buckets=2,
        nullable_keys=True,
    )
    with pytest.raises(LakeError, match="nullable_keys"):
        nk.merge(_batch(spark, MIXED), mode="dv")

    # DV merges on row-lineage tables are supported (the position scan
    # carries target ids; inserts allocate above the hwm) — deep
    # checks live in tests/test_row_lineage_mor.py
    rl = LakeTable.create(
        spark, str(tmp_path / "rl"), SCHEMA,
        key_cols=["conv_id", "turn_idx"], num_buckets=2,
        row_lineage=True,
    )
    st = rl.merge(_batch(spark, MIXED), epoch_id="rl0", mode="dv")
    assert st.extra["mode"] == "dv"
    ids = [
        r["__row_id"]
        for r in rl.read(with_lineage=True).select("__row_id").collect()
    ]
    assert all(i is not None for i in ids)
    assert len(ids) == len(set(ids))
