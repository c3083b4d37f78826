"""File-pruned CoW merge (merge(prune_files=True)) — the Delta/Iceberg
"merge with file skipping" trickle-update fast path.

Contracts pinned here:
- a pruned merge's final table state is BIT-EQUAL to the same merge
  without pruning (inserts, updates, deletes, matched_filter,
  update_cols, schema evolution);
- files proven key-disjoint are CARRIED — the exact same manifest rels
  survive into the new snapshot (no rewrite, no read);
- string keys prune in UTF-8 byte order on BOTH sides, so non-BMP
  text (emoji conv ids) can never cause a wrong carry;
- files without stats always rewrite (never wrongly carried);
- DV refs survive on partially-rewritten buckets (carried files'
  position deletes still apply); MoR-delta buckets always fold whole;
- row-lineage rows keep their ids across carried AND rewritten files;
- the CDF of a pruned merge equals the CDF of the unpruned merge;
- refusals: mor, nullable_keys, not_matched_by_source, no-bucket-prune.
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
    ]
)


def _batch(spark, rows, ts=0):
    """rows: (conv_id, turn_idx, text, op)"""
    df = spark.createDataFrame(
        [(c, t, x) for c, t, x, _ in rows], SCHEMA
    )
    ops = spark.createDataFrame(
        [(c, t, o) for c, t, _, o in rows],
        "conv_id string, turn_idx int, op string",
    )
    return (
        df.join(ops, ["conv_id", "turn_idx"])
        .withColumn("ts", F.lit(ts).cast("long"))
        .withColumn("seq", F.col("turn_idx").cast("long"))
    )


def _mk(spark, root, *, props=None, **create_kw):
    props = {"stats.auto-columns": "conv_id", **(props or {})}
    return LakeTable.create(
        spark,
        str(root),
        SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        num_buckets=4,
        properties=props,
        **create_kw,
    )


def _seed(t, spark, prefix, n=40, ts=0, **merge_kw):
    rows = [(f"{prefix}{i:04d}", 0, f"{prefix}-text-{i}", "I") for i in range(n)]
    return t.merge(
        _batch(spark, rows, ts=ts),
        epoch_id=f"seed-{prefix}-{ts}",
        order_cols=("ts", "seq"),
        drop_cols=("ts", "seq"),
        **merge_kw,
    )


def _rows(t):
    return sorted(
        (r.conv_id, r.turn_idx, r.text) for r in t.read().collect()
    )


def _bucket_files(t):
    return {b: list(fl) for b, fl in t.manifest["buckets"].items()}


def _pair(spark, tmp_path):
    """Two identical tables: one will merge pruned, one unpruned."""
    a = _mk(spark, tmp_path / "pruned")
    b = _mk(spark, tmp_path / "plain")
    for t in (a, b):
        _seed(t, spark, "a", ts=1)
        _seed(t, spark, "b", ts=2, prune_files=True)
    return a, b


MIXED = [
    ("b0003", 0, "b-updated-3", "U"),
    ("b0017", 0, "b-updated-17", "U"),
    ("b0008", 0, None, "D"),
    ("c0001", 0, "c-new-1", "I"),
    ("c0002", 0, "c-new-2", "I"),
    ("zzzz9", 0, None, "D"),  # delete of an absent key: no-op
]


def test_pruned_merge_matches_unpruned_and_carries(spark, tmp_path):
    a, b = _pair(spark, tmp_path)
    before = _bucket_files(a)
    sa = a.merge(
        _batch(spark, MIXED, ts=3),
        epoch_id="mix",
        order_cols=("ts", "seq"),
        drop_cols=("ts", "seq"),
        prune_files=True,
    )
    sb = b.merge(
        _batch(spark, MIXED, ts=3),
        epoch_id="mix",
        order_cols=("ts", "seq"),
        drop_cols=("ts", "seq"),
    )
    assert _rows(a) == _rows(b)
    assert sa.extra["files_carried"] > 0
    # carried files survive VERBATIM (same manifest rels): the batch
    # only touches b/c/z keys, disjoint from every a-range file
    after = _bucket_files(a)
    before_rels = {f for fl in before.values() for f in fl}
    after_rels = {f for fl in after.values() for f in fl}
    assert len(before_rels & after_rels) == sa.extra["files_carried"]
    # action counts match the unpruned merge
    assert (sa.n_inserted, sa.n_updated, sa.n_deleted) == (
        sb.n_inserted,
        sb.n_updated,
        sb.n_deleted,
    )


def test_no_stats_never_carries_but_stays_correct(spark, tmp_path):
    t = LakeTable.create(
        spark,
        str(tmp_path / "nostats"),
        SCHEMA,
        key_cols=["conv_id", "turn_idx"],
        num_buckets=4,
    )
    _seed(t, spark, "a", ts=1)
    _seed(t, spark, "b", ts=2)
    st = t.merge(
        _batch(spark, MIXED, ts=3),
        epoch_id="mix",
        order_cols=("ts", "seq"),
        drop_cols=("ts", "seq"),
        prune_files=True,
    )
    assert st.extra["files_carried"] == 0
    ref = _mk(spark, tmp_path / "ref")
    _seed(ref, spark, "a", ts=1)
    _seed(ref, spark, "b", ts=2)
    ref.merge(
        _batch(spark, MIXED, ts=3),
        epoch_id="mix",
        order_cols=("ts", "seq"),
        drop_cols=("ts", "seq"),
    )
    assert _rows(t) == _rows(ref)


def test_non_bmp_string_keys_never_wrongly_carried(spark, tmp_path):
    # U+1F600 (non-BMP: surrogate pair in UTF-16, 4 bytes in UTF-8)
    # vs U+FFFD (top of the BMP): Java UTF-16 code-unit order and
    # Python code-point order DISAGREE about strings mixing these.
    # Pruning compares in UTF-8 byte order on both sides, so the
    # update below must land regardless.
    emoji, bmp_top = "\U0001F600", "�"
    keys = [f"{emoji}conv", f"{bmp_top}conv", "plain", f"z{emoji}"]
    a = _mk(spark, tmp_path / "p")
    b = _mk(spark, tmp_path / "u")
    seed = [(k, 0, f"t-{i}", "I") for i, k in enumerate(keys)]
    upd = [
        (f"{emoji}conv", 0, "updated-emoji", "U"),
        (f"{bmp_top}conv", 0, "updated-bmp", "U"),
    ]
    for t in (a, b):
        t.merge(
            _batch(spark, seed, ts=1), epoch_id="s",
            order_cols=("ts", "seq"), drop_cols=("ts", "seq"),
        )
    a.merge(
        _batch(spark, upd, ts=2), epoch_id="u",
        order_cols=("ts", "seq"), drop_cols=("ts", "seq"),
        prune_files=True,
    )
    b.merge(
        _batch(spark, upd, ts=2), epoch_id="u",
        order_cols=("ts", "seq"), drop_cols=("ts", "seq"),
    )
    assert _rows(a) == _rows(b)
    got = {r.conv_id: r.text for r in a.read().collect()}
    assert got[f"{emoji}conv"] == "updated-emoji"
    assert got[f"{bmp_top}conv"] == "updated-bmp"


def test_dv_refs_survive_partial_rewrite(spark, tmp_path):
    t = _mk(spark, tmp_path / "dv")
    _seed(t, spark, "a", ts=1)
    _seed(t, spark, "b", ts=2, prune_files=True)
    t.delete_where("conv_id = 'a0001' and turn_idx = 0", mode="dv")
    assert t.manifest.get("dv_files")
    st = t.merge(
        _batch(spark, [("b0003", 0, "b-upd", "U")], ts=3),
        epoch_id="u",
        order_cols=("ts", "seq"),
        drop_cols=("ts", "seq"),
        prune_files=True,
    )
    assert st.extra["files_carried"] > 0
    # the DV'd row must stay dead even though its file was carried
    got = {r.conv_id for r in t.read().collect()}
    assert "a0001" not in got
    assert "b0003" in got
    # carried buckets keep their dv refs
    assert t.manifest.get("dv_files")


def test_mor_delta_buckets_fold_whole(spark, tmp_path):
    t = _mk(spark, tmp_path / "mor")
    _seed(t, spark, "a", ts=1)
    _seed(t, spark, "b", ts=2, prune_files=True)
    t.merge(
        _batch(spark, [("a0000", 0, "a-mor-upd", "U")], ts=3),
        epoch_id="mor1",
        order_cols=("ts", "seq"),
        drop_cols=("ts", "seq"),
        mode="mor",
    )
    delta_buckets = {b for b, fl in t.manifest["delta_files"].items() if fl}
    assert delta_buckets
    # the CoW batch touches BOTH the delta key's own bucket (a0000,0 —
    # that bucket must fold whole, never carry) and a clean b bucket
    t.merge(
        _batch(
            spark,
            [("b0004", 0, "b-upd", "U"), ("a0000", 0, "a-cow-upd", "U")],
            ts=4,
        ),
        epoch_id="cow1",
        order_cols=("ts", "seq"),
        drop_cols=("ts", "seq"),
        prune_files=True,
    )
    got = {(r.conv_id, r.turn_idx): r.text for r in t.read().collect()}
    assert got[("a0000", 0)] == "a-cow-upd"  # newer ts beats the delta
    assert got[("b0004", 0)] == "b-upd"
    # the touched delta bucket folded: refs dropped (untouched delta
    # buckets would legitimately keep theirs)
    touched_delta = str(
        spark.createDataFrame(
            [("a0000", 0)], "conv_id string, turn_idx int"
        ).select(
            t.bucket_of(F.col("conv_id"), F.col("turn_idx")).alias("b")
        ).collect()[0]["b"]
    )
    assert not t.manifest.get("delta_files", {}).get(touched_delta)


def test_row_lineage_preserved_across_carry(spark, tmp_path):
    t = _mk(spark, tmp_path / "lin", row_lineage=True)
    _seed(t, spark, "a", ts=1)
    _seed(t, spark, "b", ts=2, prune_files=True)
    ids_before = {
        (r.conv_id, r.turn_idx): r["__row_id"]
        for r in t.read(with_lineage=True).collect()
    }
    st = t.merge(
        _batch(spark, [("b0003", 0, "b-upd", "U")], ts=3),
        epoch_id="u",
        order_cols=("ts", "seq"),
        drop_cols=("ts", "seq"),
        prune_files=True,
    )
    assert st.extra["files_carried"] > 0
    after = {
        (r.conv_id, r.turn_idx): r["__row_id"]
        for r in t.read(with_lineage=True).collect()
    }
    assert after == ids_before  # updates keep ids; no inserts happened


def test_cdf_identical_to_unpruned(spark, tmp_path):
    a, b = _pair(spark, tmp_path)
    va, vb = a.version, b.version
    for t, kw in ((a, {"prune_files": True}), (b, {})):
        t.merge(
            _batch(spark, MIXED, ts=3),
            epoch_id="mix",
            order_cols=("ts", "seq"),
            drop_cols=("ts", "seq"),
            **kw,
        )
    ca = sorted(
        (r._change_type, r.conv_id, r.turn_idx, r.text)
        for r in a.changes(va).collect()
    )
    cb = sorted(
        (r._change_type, r.conv_id, r.turn_idx, r.text)
        for r in b.changes(vb).collect()
    )
    assert ca == cb
    assert any(c[0] == "D" for c in ca)


def test_matched_filter_and_update_cols_with_pruning(spark, tmp_path):
    a, b = _pair(spark, tmp_path)
    batch = [
        ("b0003", 0, "veto-me", "U"),   # matched_filter rejects
        ("a0001", 0, "take-me", "U"),   # passes
        ("d0001", 0, "insert-me", "I"),
    ]
    for t, kw in ((a, {"prune_files": True}), (b, {})):
        t.merge(
            _batch(spark, batch, ts=3),
            epoch_id="f",
            order_cols=("ts", "seq"),
            drop_cols=("ts", "seq"),
            matched_filter=F.col("t.text").startswith("a-"),
            **kw,
        )
    assert _rows(a) == _rows(b)
    got = {r.conv_id: r.text for r in a.read().collect()}
    assert got["b0003"] == "b-text-3"      # vetoed: target kept
    assert got["a0001"] == "take-me"
    assert got["d0001"] == "insert-me"


def test_schema_evolution_with_pruning(spark, tmp_path):
    a, b = _pair(spark, tmp_path)
    batch = (
        _batch(spark, [("b0005", 0, "b-evolved", "U")], ts=3)
        .withColumn("tool", F.lit("search"))
    )
    for t, kw in ((a, {"prune_files": True}), (b, {})):
        t.merge(
            batch,
            epoch_id="ev",
            order_cols=("ts", "seq"),
            drop_cols=("ts", "seq"),
            **kw,
        )
    ra = sorted(map(tuple, a.read().collect()))
    rb = sorted(map(tuple, b.read().collect()))
    assert ra == rb
    got = {r.conv_id: r.tool for r in a.read().collect()}
    assert got["b0005"] == "search"
    assert got["a0001"] is None  # carried old file: projected NULL


def test_refusals(spark, tmp_path):
    t = _mk(spark, tmp_path / "r")
    _seed(t, spark, "a", ts=1)
    batch = _batch(spark, [("a0001", 0, "x", "U")], ts=2)
    with pytest.raises(LakeError, match="mode='cow'"):
        t.merge(batch, prune_files=True, mode="mor",
                order_cols=("ts", "seq"), drop_cols=("ts", "seq"))
    with pytest.raises(LakeError, match="prune_buckets"):
        t.merge(batch, prune_files=True, prune_buckets=False,
                order_cols=("ts", "seq"), drop_cols=("ts", "seq"))
    with pytest.raises(LakeError, match="not_matched_by_source"):
        t.merge(batch, prune_files=True, op_col=None,
                not_matched_by_source="delete",
                order_cols=("ts", "seq"), drop_cols=("ts", "seq"))
    nk = LakeTable.create(
        spark, str(tmp_path / "nk"), SCHEMA,
        key_cols=["conv_id", "turn_idx"], num_buckets=4,
        nullable_keys=True,
    )
    with pytest.raises(LakeError, match="nullable_keys"):
        nk.merge(batch, prune_files=True,
                 order_cols=("ts", "seq"), drop_cols=("ts", "seq"))


def test_insert_only_bucket_with_all_files_carried(spark, tmp_path):
    t = _mk(spark, tmp_path / "ins")
    _seed(t, spark, "a", ts=1)
    # pure inserts far from the a-range: every existing file carries,
    # merged output per bucket = just the new rows
    st = t.merge(
        _batch(spark, [("x0001", 0, "x1", "I"), ("x0002", 0, "x2", "I")], ts=2),
        epoch_id="x",
        order_cols=("ts", "seq"),
        drop_cols=("ts", "seq"),
        prune_files=True,
    )
    assert st.extra["files_carried"] > 0
    assert st.n_inserted == 2 and st.n_updated == 0
    got = {r.conv_id for r in t.read().collect()}
    assert {"x0001", "x0002"} <= got and "a0001" in got

def test_bloom_probe_prunes_unclustered_files(spark, tmp_path):
    # files_per_bucket>1 splits each bucket by a key HASH — random
    # subsets per file. Updating one bucket's MIN and MAX key makes
    # the batch range span every file in it, so min/max stats can
    # carry NOTHING; only the bloom membership probe can prove a file
    # disjoint from the two probed keys.
    from collections import defaultdict

    def _layout(root):
        t = _mk(spark, root)
        _seed(t, spark, "a", n=200, ts=1, files_per_bucket=4,
              target_file_bytes=1024)
        t.analyze_bloom(["conv_id"])
        assign = spark.createDataFrame(
            [(f"a{i:04d}", 0) for i in range(200)],
            "conv_id string, turn_idx int",
        ).select(
            "conv_id",
            t.bucket_of(F.col("conv_id"), F.col("turn_idx")).alias("b"),
        ).collect()
        bykey = defaultdict(list)
        for r in assign:
            bykey[r.b].append(r.conv_id)
        b0 = sorted(bykey)[0]
        ks = sorted(bykey[b0])
        return t, ks[0], ks[-1]

    t, lo, hi = _layout(tmp_path / "bloom")
    batch = [(lo, 0, "lo-upd", "U"), (hi, 0, "hi-upd", "U")]
    st = t.merge(
        _batch(spark, batch, ts=2),
        epoch_id="u",
        order_cols=("ts", "seq"),
        drop_cols=("ts", "seq"),
        prune_files=True,
    )
    assert st.extra["files_carried"] > 0
    got = {r.conv_id: r.text for r in t.read().collect()}
    assert got[lo] == "lo-upd" and got[hi] == "hi-upd"
    assert len(got) == 200

    # same layout, bloom probing off: the batch range spans the whole
    # bucket, so pure range pruning carries nothing
    t2, lo2, hi2 = _layout(tmp_path / "nobloom")
    st2 = t2.merge(
        _batch(spark, [(lo2, 0, "lo-upd", "U"), (hi2, 0, "hi-upd", "U")],
               ts=2),
        epoch_id="u",
        order_cols=("ts", "seq"),
        drop_cols=("ts", "seq"),
        prune_files=True,
        bloom_probe_limit=0,
    )
    assert st2.extra["files_carried"] == 0
