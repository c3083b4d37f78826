"""stats.auto-columns (stats-on-write): CoW merges, compactions, and
MoR delta folds collect per-file min/max bounds for the named columns
from the files they just wrote, in the SAME commit — read_where pruning
stays fresh with no separate analyze() maintenance pass (Iceberg's
write-time data-file bounds). Covers the inline and spilled (scs-*
sidecar) manifest regimes."""

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F, types as T

from haskell_dbfunctor_spark.lake.table import LakeTable

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("seq", T.LongType()),
])

PROPS = {"stats.auto-columns": "seq,ts"}


def _batch(spark, rows):
    return spark.createDataFrame(
        [Row(op=op, k=k, v=v,
             ts=dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), seq=s)
         for (op, k, v, s) in rows],
        "op string, k long, v string, ts timestamp, seq long",
    )


def _table(spark, tmp_path, **kw):
    return LakeTable.create(
        spark, str(tmp_path / "lake"), SCHEMA, key_cols=["k"],
        num_buckets=4, properties=PROPS, **kw,
    )


def test_merge_prunes_without_analyze(spark, tmp_path):
    table = _table(spark, tmp_path)
    table.merge(_batch(spark, [("U", k, f"v{k}", k) for k in range(16)]),
                epoch_id="e0")
    table.merge(_batch(spark, [("U", 3, "hot", 1000)]), epoch_id="e1")
    # NO analyze() anywhere: the merges collected the bounds themselves
    out = table.read_where("seq", 1000, None)
    assert [(r["k"], r["seq"]) for r in out.collect()] == [(3, 1000)]
    assert table.last_pruned_files >= 3

    # correctness equivalence on a mid-range probe
    expect = sorted(
        (r["k"], r["seq"])
        for r in table.read().where(F.col("seq").between(4, 9)).collect()
    )
    got = sorted(
        (r["k"], r["seq"]) for r in table.read_where("seq", 4, 9).collect()
    )
    assert got == expect

    # analyze() recognizes the write-time entries: nothing left to read
    assert table.analyze(["seq", "ts"])["files_analyzed"] == 0


def test_timestamp_bounds_collected_at_write(spark, tmp_path):
    table = _table(spark, tmp_path)
    table.merge(_batch(spark, [("U", k, "a", k) for k in range(8)]),
                epoch_id="e0")
    lo = dt.datetime(2024, 1, 1) + dt.timedelta(seconds=5)
    out = table.read_where("ts", lo, None)
    assert sorted(r["seq"] for r in out.collect()) == [5, 6, 7]


def test_spilled_regime_updates_only_touched_sidecars(
    spark, tmp_path, monkeypatch
):
    monkeypatch.setenv("SPARK_GRAFT_META_SPILL_BYTES", "0")  # force spill
    table = _table(spark, tmp_path)
    table.merge(_batch(spark, [("U", k, f"v{k}", k) for k in range(16)]),
                epoch_id="e0")
    refs0 = dict(table.manifest.get("stats_refs") or {})
    assert refs0, "spilled table should hold scs-* stats refs after merge"
    # epoch 1 rewrites ONE key -> one bucket; other buckets' sidecars
    # must carry forward byte-identical (content-addressed names equal)
    table.merge(_batch(spark, [("U", 3, "hot", 1000)]), epoch_id="e1")
    refs1 = dict(table.manifest.get("stats_refs") or {})
    changed = [b for b in refs0 if refs1.get(b) != refs0[b]]
    assert len(changed) == 1, f"one bucket rewritten, refs changed: {changed}"

    out = table.read_where("seq", 1000, None)
    assert [(r["k"], r["seq"]) for r in out.collect()] == [(3, 1000)]
    assert table.last_pruned_files >= 3

    # a RELOADED handle prunes identically (stats really on disk)
    t2 = LakeTable.load(spark, table.root)
    out2 = t2.read_where("seq", 1000, None)
    assert [(r["k"], r["seq"]) for r in out2.collect()] == [(3, 1000)]
    assert t2.last_pruned_files >= 3


def test_compaction_refreshes_stats(spark, tmp_path):
    table = _table(spark, tmp_path)
    for e in range(3):
        table.merge(
            _batch(spark, [("U", k, f"v{e}", e * 16 + k) for k in range(8)]),
            epoch_id=f"e{e}",
        )
    table.compact(sort_by="seq", target_file_bytes=1)
    out = table.read_where("seq", 40, None)
    expect = sorted(
        r["k"] for r in table.read().where(F.col("seq") >= 40).collect()
    )
    assert sorted(r["k"] for r in out.collect()) == expect
    # compacted (sorted, range-split) files carry fresh bounds: some
    # file is skippable even though analyze() never ran
    assert table.analyze(["seq"])["files_analyzed"] == 0


def test_mor_fold_collects_stats(spark, tmp_path):
    table = _table(spark, tmp_path)
    table.merge(_batch(spark, [("U", k, "a", k) for k in range(8)]),
                epoch_id="e0")
    table.merge(_batch(spark, [("U", 1, "patched", 500)]), epoch_id="e1",
                mode="mor")
    # collapse-before-filter still correct while the delta is pending
    out = {r["k"]: r["seq"] for r in table.read_where("seq", 100, None).collect()}
    assert out == {1: 500}
    table.compact_deltas()
    out2 = table.read_where("seq", 100, None)
    assert {r["k"]: r["seq"] for r in out2.collect()} == {1: 500}
    # the folded bucket's new base file was statted at write time
    assert table.last_pruned_files >= 1
    assert table.analyze(["seq", "ts"])["files_analyzed"] == 0


def test_unknown_auto_column_ignored(spark, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SCHEMA, key_cols=["k"],
        num_buckets=4, properties={"stats.auto-columns": "nope, seq"},
    )
    table.merge(_batch(spark, [("U", k, "a", k) for k in range(8)]),
                epoch_id="e0")
    out = table.read_where("seq", 6, None)
    assert sorted(r["seq"] for r in out.collect()) == [6, 7]
    assert table.last_pruned_files >= 1  # 'seq' still collected


def test_property_off_means_no_write_time_stats(spark, tmp_path):
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), SCHEMA, key_cols=["k"], num_buckets=4
    )
    table.merge(_batch(spark, [("U", k, "a", k) for k in range(8)]),
                epoch_id="e0")
    out = table.read_where("seq", 6, None)
    assert sorted(r["seq"] for r in out.collect()) == [6, 7]
    assert table.last_pruned_files == 0
