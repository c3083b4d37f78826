"""analyze() + read_where(): per-file min/max stats in the manifest and
stats-based file skipping — correctness, actual pruning, MoR collapse
ordering, timestamp domains, and the maintenance CLI."""

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F, types as T

from haskell_dbfunctor_spark.lake.table import LakeError, LakeTable

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("seq", T.LongType()),
])


def _batch(spark, rows):
    return spark.createDataFrame(
        [Row(op=op, k=k, v=v,
             ts=dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), seq=s)
         for (op, k, v, s) in rows],
        "op string, k long, v string, ts timestamp, seq long",
    )


@pytest.fixture()
def table(spark, tmp_path):
    return LakeTable.create(
        spark, str(tmp_path / "lake"), SCHEMA, key_cols=["k"], num_buckets=4
    )


def test_read_where_matches_filter_and_prunes(spark, table):
    # epoch 0: seq 0..15 spread over all buckets
    table.merge(_batch(spark, [("U", k, f"v{k}", k) for k in range(16)]),
                epoch_id="e0")
    table.analyze(["seq", "ts"])
    # epoch 1: ONE key (one bucket) gets seq 1000
    table.merge(_batch(spark, [("U", 3, "hot", 1000)]), epoch_id="e1")
    table.analyze(["seq"])

    out = table.read_where("seq", 1000, None)
    assert [(r["k"], r["seq"]) for r in out.collect()] == [(3, 1000)]
    # every bucket not rewritten by e1 has stats maxing at <=15 -> skipped
    assert table.last_pruned_files >= 3
    # read files are exactly the non-pruned set
    assert len(out.inputFiles()) <= 1

    # equivalence with the unpruned filter on a mid-range query
    lo, hi = 4, 9
    expect = sorted(
        (r["k"], r["seq"])
        for r in table.read().where(F.col("seq").between(lo, hi)).collect()
    )
    got = sorted(
        (r["k"], r["seq"]) for r in table.read_where("seq", lo, hi).collect()
    )
    assert got == expect


def test_read_where_timestamp_domain(spark, table):
    table.merge(_batch(spark, [("U", k, "a", k) for k in range(8)]),
                epoch_id="e0")
    table.analyze(["ts"])
    lo = dt.datetime(2024, 1, 1) + dt.timedelta(seconds=5)
    out = table.read_where("ts", lo, None)
    assert sorted(r["seq"] for r in out.collect()) == [5, 6, 7]


def test_read_where_unanalyzed_files_never_skipped(spark, table):
    table.merge(_batch(spark, [("U", k, "a", k) for k in range(8)]),
                epoch_id="e0")
    # NO analyze: every file lacks stats, nothing may be skipped
    out = table.read_where("seq", 6, None)
    assert sorted(r["seq"] for r in out.collect()) == [6, 7]
    assert table.last_pruned_files == 0


def test_read_where_mor_collapse_before_filter(spark, table):
    """A delta moves a key INTO the range: filter-after-collapse must
    see the new image even though the base file's stats exclude it."""
    table.merge(_batch(spark, [("U", 1, "a", 1), ("U", 2, "b", 2)]),
                epoch_id="e0")
    table.analyze(["seq"])
    table.merge(_batch(spark, [("U", 1, "a2", 500)]), epoch_id="e1",
                mode="mor")
    out = {r["k"]: r["seq"] for r in table.read_where("seq", 100, None).collect()}
    assert out == {1: 500}
    # and OUT of the range: base image seq=2 must not resurface
    out2 = {r["k"]: r["seq"] for r in table.read_where("seq", None, 99).collect()}
    assert out2 == {2: 2}


def test_analyze_incremental_and_validation(spark, table):
    table.merge(_batch(spark, [("U", 1, "a", 1)]), epoch_id="e0")
    r1 = table.analyze(["seq"])
    assert r1["files_analyzed"] >= 1
    r2 = table.analyze(["seq"])     # idempotent: nothing new to read
    assert r2["files_analyzed"] == 0
    with pytest.raises(LakeError, match="unknown column"):
        table.analyze(["nope"])
    with pytest.raises(LakeError, match="bound"):
        table.read_where("seq")


def test_compact_sort_by_clusters_and_prunes(spark, table):
    """compact(sort_by=...) range-splits sibling files: after analyze,
    per-bucket file intervals are disjoint and a narrow range query
    skips out-of-range files WITHIN a bucket (not just across
    buckets). Also: _commit drops stats of rewritten (dead) files."""
    table.merge(_batch(spark, [("U", k, f"v{k}", k) for k in range(200)]),
                epoch_id="e0")
    table.analyze(["seq"])
    pre_stats_files = set(
        LakeTable.load(spark, table.root)._stats_map()
    )
    res = table.compact(sort_by="seq", target_file_bytes=2000)
    assert res["buckets_compacted"] == 4
    live = {
        rel for fl in table.manifest["buckets"].values() for rel in fl
    }
    if "file_stats" in table.manifest:
        # inline path: _commit prunes rewritten (dead) files' entries
        assert set(table.manifest["file_stats"]) <= live
        assert not (set(table.manifest["file_stats"]) & pre_stats_files)
    # spilled path: carried scs refs may keep dead-file entries —
    # harmless by contract (lookups key live paths only)

    table.analyze(["seq"])
    # at least one bucket has >= 2 files, and those files' seq ranges
    # are disjoint (that's what range-splitting buys)
    fstats = table._stats_map()
    multi = False
    for b, files in table.manifest["buckets"].items():
        if len(files) < 2:
            continue
        multi = True
        spans = sorted(tuple(fstats[f]["seq"]) for f in files)
        for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
            assert hi1 <= lo2, (b, spans)
    assert multi, "expected at least one bucket split into 2+ files"

    # narrow range query: correct AND intra-bucket files skipped
    out = sorted(r["seq"] for r in table.read_where("seq", 190, None).collect())
    assert out == list(range(190, 200))
    assert table.last_pruned_files >= 1
    expect = sorted(
        r["seq"] for r in table.read().where("seq BETWEEN 50 AND 60").collect()
    )
    got = sorted(r["seq"] for r in table.read_where("seq", 50, 60).collect())
    assert got == expect


def test_maintenance_cli_compact_sort_by(spark, table):
    from jobs.lake_maintenance import main

    table.merge(_batch(spark, [("U", k, "a", k) for k in range(40)]),
                epoch_id="e0")
    rc = main(["--table-root", table.root, "compact", "--sort-by", "seq"])
    assert rc == 0


def test_load_as_of_timestamp(spark, table):
    import time as _time

    table.merge(_batch(spark, [("U", 1, "a", 1)]), epoch_id="e0")
    t_mid = _time.time()
    _time.sleep(0.05)
    table.merge(_batch(spark, [("U", 1, "b", 2)]), epoch_id="e1")
    old = LakeTable.load(spark, table.root, as_of=t_mid)
    assert [r["v"] for r in old.read().collect()] == ["a"]
    with pytest.raises(LakeError, match="no snapshot"):
        LakeTable.load(spark, table.root, as_of=0.0)
    with pytest.raises(LakeError, match="not both"):
        LakeTable.load(spark, table.root, version=1, as_of=t_mid)


def test_maintenance_cli_analyze(spark, table):
    from jobs.lake_maintenance import main

    table.merge(_batch(spark, [("U", 1, "a", 1)]), epoch_id="e0")
    rc = main(["--table-root", table.root, "analyze", "--cols", "seq,ts"])
    assert rc == 0
    t2 = LakeTable.load(spark, table.root)
    assert any(t2._stats_map().values())


def test_concurrent_analyze_merges_columns(spark, table):
    """Two analyzes of DIFFERENT columns racing each other must both
    survive: the apply closure merges per-(file, column) entries into
    the up-to-date parent instead of replacing the map wholesale."""
    table.merge(_batch(spark, [("U", k, f"v{k}", k) for k in range(16)]),
                epoch_id="e0")
    # handle B forks from the same base as handle A
    tb = LakeTable.load(spark, table.root)
    table.analyze(["seq"])   # commits stats for seq
    tb.analyze(["k"])        # concurrent commit: stats for k only
    fresh = LakeTable.load(spark, table.root)
    fstats = fresh._stats_map()
    cols_seen = {c for e in fstats.values() for c in e}
    assert "seq" in cols_seen, "first analyze's stats lost"
    assert "k" in cols_seen, "second analyze's stats lost"
    # and both prune
    fresh.read_where("seq", 1000, None).count()
    assert fresh.last_pruned_files > 0
    fresh.read_where("k", 1000, None).count()
    assert fresh.last_pruned_files > 0


def test_string_stats_never_prune(spark, table):
    """String-domain stats must not file-prune: Python code-point vs
    Java UTF-16 code-unit ordering diverge beyond the BMP, so a range
    check could wrongly skip a matching file. Correctness over pruning:
    the read still returns exact results, with zero skipped files."""
    table.merge(_batch(spark, [("U", k, f"v{k:02d}", k) for k in range(8)]),
                epoch_id="e0")
    table.analyze(["v", "seq"])
    out = table.read_where("v", "v06", "v07")
    assert sorted(r["k"] for r in out.collect()) == [6, 7]
    assert table.last_pruned_files == 0  # strings: no pruning, ever
    # numeric stats on the same table still prune
    table.read_where("seq", 1000, None).count()
    assert table.last_pruned_files > 0
