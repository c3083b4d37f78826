"""Predicate-level DML (lake/dml.py): DELETE FROM / UPDATE ... WHERE.

Contracts:
- semantics match SQL (NULL predicate rows untouched; assignments see
  the OLD row; type-pinned casts; key columns unassignable);
- CoW rewrites ONLY the data files that contain matching rows —
  non-matching files carry into the new snapshot by reference;
- MoR appends O(matches) deltas, never touching base files;
- the CDF sees deletes/updates like any other commit;
- epoch ids are exactly-once, including the zero-match case.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest
from pyspark.sql import functions as F, types as T

from haskell_dbfunctor_spark.lake.table import LakeError, LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("grp", T.StringType(), True),
        T.StructField("val", T.LongType(), True),
    ]
)


def _mk(spark, root, rows, num_buckets=8) -> LakeTable:
    t = LakeTable.create(
        spark, str(root), SCHEMA, key_cols=["k"], num_buckets=num_buckets
    )
    df = spark.createDataFrame(rows, SCHEMA).withColumn(
        "op", F.lit("U")
    ).withColumn("ts", F.lit(0).cast("long")).withColumn(
        "seq", F.col("k")
    )
    t.merge(df, epoch_id="seed", order_cols=("ts", "seq"),
            drop_cols=("ts", "seq"))
    return t


def _rows(table):
    return sorted(
        (r.k, r.grp, r.val) for r in table.read().collect()
    )


ROWS = [(i, "a" if i % 3 == 0 else ("b" if i % 3 == 1 else None), i * 10)
        for i in range(60)]


def test_delete_where_semantics_and_null_predicate(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", ROWS)
    # grp='a' matches i%3==0; grp=NULL rows make the predicate NULL ->
    # NOT matched (SQL DELETE keeps them)
    stats = t.delete_where(F.col("grp") == "a")
    want = [r for r in ROWS if not (r[1] == "a")]
    assert _rows(t) == sorted(want)
    assert stats.n_deleted == sum(1 for r in ROWS if r[1] == "a")
    assert stats.extra["files_rewritten"] >= 1


def test_delete_rewrites_only_matching_files(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", ROWS, num_buckets=8)
    before = {b: list(fs) for b, fs in t.manifest["buckets"].items()}
    # one specific key lives in exactly one bucket's file(s)
    stats = t.delete_where(F.col("k") == 7)
    after = t.manifest["buckets"]
    changed = [b for b in before if before[b] != after.get(b, [])]
    # every bucket except the one holding k=7 carries by reference
    assert len(changed) == stats.buckets_touched == 1
    untouched = [b for b in before if b not in changed]
    assert all(before[b] == after[b] for b in untouched)
    assert (7, "b", 70) not in _rows(t)
    assert len(_rows(t)) == len(ROWS) - 1


def test_update_where_old_row_semantics_and_cast(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", ROWS)
    # swap-style: val references the OLD val; 2.5 casts back to long
    t.update_where(
        "val >= 100 AND val < 200",
        {"val": F.col("val") * 2 + F.lit(0.5)},
    )
    want = sorted(
        (k, g, v * 2 if 100 <= v < 200 else v) for (k, g, v) in ROWS
    )
    assert _rows(t) == want
    assert t.schema["val"].dataType == T.LongType()  # no evolution


def test_update_where_rejects_key_and_unknown_columns(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", ROWS[:6])
    with pytest.raises(LakeError, match="key column"):
        t.update_where("val > 0", {"k": F.lit(99)})
    with pytest.raises(LakeError, match="unknown column"):
        t.update_where("val > 0", {"nope": F.lit(1)})


def test_dml_epoch_idempotent_including_zero_match(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", ROWS)
    s1 = t.delete_where("val >= 500", epoch_id="d1")
    assert not s1.skipped and s1.n_deleted == 10
    v = t.version
    s2 = t.delete_where("val >= 500", epoch_id="d1")
    assert s2.skipped and t.version == v
    # zero-match epoch still records (replay skips the discovery scan)
    s3 = t.delete_where("val >= 99999", epoch_id="d2")
    assert not s3.skipped and s3.n_deleted == 0 and t.version == v + 1
    s4 = t.delete_where("val >= 99999", epoch_id="d2")
    assert s4.skipped and t.version == v + 1


def test_delete_where_cdf_shows_deletes(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", ROWS)
    v0 = t.version
    t.delete_where("k < 5")
    ch = t.changes(v0, t.version)
    d = {r.k for r in ch.where(F.col("_change_type") == "D").collect()}
    assert d == {0, 1, 2, 3, 4}
    assert ch.where(F.col("_change_type") != "D").count() == 0


def test_mor_delete_appends_tombstones_not_rewrites(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", ROWS)
    base = {b: list(fs) for b, fs in t.manifest["buckets"].items()}
    stats = t.delete_where("grp = 'b'", mode="mor")
    assert dict(t.manifest["buckets"]) == base  # base untouched
    assert sum(len(f) for f in t.manifest["delta_files"].values()) > 0
    want = [r for r in ROWS if r[1] != "b"]
    assert _rows(t) == sorted(want)
    assert stats.n_deleted == sum(1 for r in ROWS if r[1] == "b")
    # compaction folds tombstones; state unchanged
    t.compact_deltas()
    assert not t.manifest.get("delta_files")
    assert _rows(t) == sorted(want)


def test_mor_update_patches_through_collapse(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", ROWS)
    t.update_where("grp = 'a'", {"val": F.col("val") + 1}, mode="mor")
    want = sorted(
        (k, g, v + 1 if g == "a" else v) for (k, g, v) in ROWS
    )
    assert _rows(t) == want


def test_cow_delete_folds_pending_deltas(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", ROWS)
    # leave MoR deltas pending (an update), then CoW-delete overlapping
    # rows: delta-bearing buckets must rewrite whole and fold
    t.update_where("k % 2 = 0", {"val": F.col("val") + 1000}, mode="mor")
    delta_before = {b for b, f in t.manifest["delta_files"].items() if f}
    assert delta_before
    stats = t.delete_where("val >= 1400")  # only updated rows reach 1400+
    # touched delta-bearing buckets folded their deltas into the new
    # base; delta buckets with no matching rows keep theirs
    delta_after = {b for b, f in t.manifest.get("delta_files", {}).items() if f}
    assert len(delta_after) < len(delta_before)
    assert stats.extra["delta_buckets_folded"] == len(delta_before) - len(
        delta_after
    )
    want = sorted(
        (k, g, v + 1000 if k % 2 == 0 else v)
        for (k, g, v) in ROWS
        if not (k % 2 == 0 and v + 1000 >= 1400)
    )
    assert _rows(t) == want


def test_conjunct_bounds_parser_is_conservative():
    from haskell_dbfunctor_spark.lake.dml import _conjunct_bounds

    assert _conjunct_bounds("val >= 500") == [("val", ">=", 500)]
    assert _conjunct_bounds("a < 1.5 AND b = 'x'") == [
        ("a", "<", 1.5), ("b", "=", "x")
    ]
    ts = _conjunct_bounds("ts < timestamp'2026-01-01 00:00:00'")
    assert ts and ts[0][0] == "ts" and isinstance(ts[0][2], float)
    # anything beyond simple AND-of-comparisons must bail (no pruning,
    # never a wrong skip)
    for p in ("val >= 500 OR grp = 'a'", "(val >= 500)", "NOT val > 1",
              "val IN (1,2)", "grp IS NULL", "grp LIKE 'a%'",
              "length(grp) > 2", "val BETWEEN 1 AND 2"):
        assert _conjunct_bounds(p) is None, p


def test_delete_where_prunes_files_via_manifest_stats(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", ROWS)
    t.analyze(["val"])
    # val >= 590 matches only k=59: every file whose recorded max(val)
    # sits below the cutoff is skipped without being opened
    stats = t.delete_where("val >= 590")
    assert stats.n_deleted == 1
    assert stats.extra["files_stat_pruned"] > 0
    assert stats.extra["files_rewritten"] >= 1
    assert len(_rows(t)) == len(ROWS) - 1
    # a Column predicate (no SQL string to parse) still works, no prune
    s2 = t.delete_where(F.col("val") >= 580)
    assert s2.extra["files_stat_pruned"] == 0 and s2.n_deleted == 1


def test_maintenance_cli_dml_subcommands(spark, tmp_path, capsys):
    import json

    from jobs.lake_maintenance import main

    t = _mk(spark, tmp_path / "t", ROWS)
    rc = main([
        "--table-root", t.root, "delete-where",
        "--predicate", "val >= 500", "--epoch-id", "ret1",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_deleted"] == 10 and not out["skipped"]
    rc = main([
        "--table-root", t.root, "update-where",
        "--predicate", "grp = 'a'",
        "--set", "val=val + 7", "--set", "grp=upper(grp)",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_updated"] == sum(
        1 for r in ROWS if r[1] == "a" and r[2] < 500
    )
    t = LakeTable.load(spark, t.root)
    want = sorted(
        (k, "A" if g == "a" else g, v + 7 if g == "a" else v)
        for (k, g, v) in ROWS if v < 500
    )
    assert _rows(t) == want


def test_dml_refused_on_staged_snapshot(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", ROWS[:9])
    batch = spark.createDataFrame([(100, "z", 1)], SCHEMA).withColumn(
        "op", F.lit("U")
    ).withColumn("ts", F.lit(1).cast("long")).withColumn("seq", F.lit(1))
    t.merge(batch, epoch_id="s1", order_cols=("ts", "seq"),
            drop_cols=("ts", "seq"), stage_only=True)
    with pytest.raises(LakeError, match="STAGED"):
        t.delete_where("val > 0")
    with pytest.raises(LakeError, match="STAGED"):
        t.update_where("val > 0", {"val": F.lit(1)})
