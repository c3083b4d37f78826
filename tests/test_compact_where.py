"""buckets_where() + compact(where=...): range-scoped maintenance.

A trickle-ingest table is fragmented only where recent epochs landed;
``compact(where=(col, lo, hi))`` resolves the stats-intersecting
buckets (``buckets_where``) and pays O(hot range), not O(table).
"""

import datetime as dt

import pytest
from pyspark.sql import Row, types as T

from haskell_dbfunctor_spark.lake.table import LakeError, LakeTable

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])


def _batch(spark, keys, tag="v"):
    return spark.createDataFrame(
        [Row(op="U", k=k, v=f"{tag}{k}",
             ts=dt.datetime(2024, 1, 1) + dt.timedelta(seconds=k))
         for k in keys],
        "op string, k long, v string, ts timestamp",
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "lake"), SCHEMA, key_cols=["k"], num_buckets=4
    )
    # tiny target + files_per_bucket=3 fragments every bucket into 3
    # files (the long-trickle-history state compact exists to repair)
    t.merge(_batch(spark, range(32)), epoch_id="e0",
            order_cols=("ts",), drop_cols=(),
            files_per_bucket=3, target_file_bytes=1)
    t.analyze(["k"])
    return t


def test_buckets_where_is_stats_tight(table):
    every = table.buckets_where("k", 0, 31)
    assert sorted(every) == sorted(
        int(b) for b, fs in table.manifest["buckets"].items() if fs
    )
    # edge-of-domain point: only buckets holding key 31 have max == 31
    sub = table.buckets_where("k", 31, 31)
    assert sub and set(sub) < set(every)
    # out-of-domain range hits nothing
    assert table.buckets_where("k", 1000, 2000) == []
    with pytest.raises(LakeError):
        table.buckets_where("k")


def test_buckets_where_conservative_without_stats(table):
    # a column never analyzed -> no stats -> every bucket may match
    assert sorted(table.buckets_where("v", "a", "b")) == sorted(
        table.buckets_where("k", 0, 31)
    )


def test_buckets_where_includes_delta_bearing_bucket(spark, table):
    table.merge(_batch(spark, [7]), epoch_id="e3", order_cols=("ts",),
                drop_cols=(), mode="mor")
    dm = table.manifest.get("delta_files", {})
    (db,) = [int(b) for b in dm if dm[b]]
    # even a range that excludes key 7's stats must include the
    # delta-bearing bucket (mutable image, never judged by base stats)
    assert db in table.buckets_where("k", 1000, 2000)


def test_compact_where_rewrites_only_scope(table):
    before = {b: list(fs) for b, fs in table.manifest["buckets"].items()}
    frag = {int(b) for b, fs in before.items() if len(fs) > 1}
    scope = set(table.buckets_where("k", 31, 31))
    # the fixture fragments BOTH ends of the key range; the point scope
    # must leave some fragmented bucket outside it for this test to
    # prove anything
    assert frag & scope and frag - scope
    state_before = {r["k"]: r["v"] for r in table.read().collect()}
    res = table.compact(where=("k", 31, 31))
    after = table.manifest["buckets"]
    changed = {int(b) for b, fs in after.items() if fs != before[b]}
    assert changed == frag & scope
    assert res["buckets_compacted"] == len(changed)
    for b in changed:
        assert len(after[str(b)]) == 1
    for b in frag - scope:  # out-of-scope fragmentation survives
        assert after[str(b)] == before[str(b)]
    assert {r["k"]: r["v"] for r in table.read().collect()} == state_before


def test_compact_where_empty_scope_is_noop(table):
    v = table.version
    res = table.compact(where=("k", 1000, 2000))
    assert res == {
        "buckets_compacted": 0, "files_before": 0, "files_after": 0
    }
    assert table.version == v


def test_compact_where_and_buckets_mutually_exclusive(table):
    with pytest.raises(LakeError, match="buckets OR where"):
        table.compact(where=("k", 0, 1), buckets=[0])


def test_cli_compact_where(table):
    from jobs.lake_maintenance import main

    before = {b: list(fs) for b, fs in table.manifest["buckets"].items()}
    scope = set(table.buckets_where("k", 31, 31))
    rc = main(["--table-root", table.root,
               "compact", "--where", "k", "31", "none"])
    assert rc == 0
    after = LakeTable.load(table.spark, table.root).manifest["buckets"]
    changed = {int(b) for b, fs in after.items() if fs != before[b]}
    assert changed and changed <= scope
