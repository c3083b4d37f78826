"""LakeTable.changes() — change-data-feed semantics, bucket pruning,
merge-on-read deltas, and the rebucket fallback."""

import datetime as dt

import pytest
from pyspark.sql import Row, types as T

from haskell_dbfunctor_spark.lake.table import LakeTable

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


def test_changes_iud_semantics(spark, table):
    table.merge(_batch(spark, [
        ("U", 1, "a", 1), ("U", 2, "b", 2), ("U", 3, "c", 3),
    ]), epoch_id="e0")
    v1 = table.version
    table.merge(_batch(spark, [
        ("U", 2, "b2", 4),   # update
        ("D", 3, None, 5),   # delete
        ("U", 4, "d", 6),    # insert
        ("U", 1, "a", 1),    # identical re-send: NOT a change
    ]), epoch_id="e1")
    ch = {r["k"]: r for r in table.changes(v1).collect()}
    assert set(ch) == {2, 3, 4}
    assert ch[2]["_change_type"] == "U" and ch[2]["v"] == "b2"
    assert ch[3]["_change_type"] == "D" and ch[3]["v"] == "c"  # pre-image
    assert ch[4]["_change_type"] == "I" and ch[4]["v"] == "d"


def test_changes_prunes_untouched_buckets(spark, table, monkeypatch):
    table.merge(_batch(spark, [("U", i, f"v{i}", i) for i in range(1, 9)]),
                epoch_id="e0")
    v1 = table.version
    table.merge(_batch(spark, [("U", 1, "new", 100)]), epoch_id="e1")

    seen = []
    orig = LakeTable.read

    def spy(self, buckets=None, **kw):
        seen.append(buckets)
        return orig(self, buckets, **kw)

    monkeypatch.setattr(LakeTable, "read", spy)
    out = table.changes(v1).collect()
    assert [r["k"] for r in out] == [1] and out[0]["_change_type"] == "U"
    # both snapshot reads were restricted to the single touched bucket
    assert len(seen) == 2
    for buckets in seen:
        assert buckets is not None and len(buckets) == 1


def test_changes_empty_when_no_commits(spark, table):
    table.merge(_batch(spark, [("U", 1, "a", 1)]), epoch_id="e0")
    assert table.changes(table.version).count() == 0


def test_changes_across_mor_delta_commit(spark, table):
    table.merge(_batch(spark, [("U", 1, "a", 1), ("U", 2, "b", 2)]),
                epoch_id="e0")
    v1 = table.version
    table.merge(_batch(spark, [("U", 1, "a2", 3), ("D", 2, None, 4)]),
                epoch_id="e1", mode="mor")
    ch = {r["k"]: r["_change_type"] for r in table.changes(v1).collect()}
    assert ch == {1: "U", 2: "D"}


def test_changes_preimages_contract(spark, table):
    table.merge(_batch(spark, [("U", 1, "a", 1), ("U", 2, "b", 2)]),
                epoch_id="e0")
    v1 = table.version
    table.merge(_batch(spark, [("U", 1, "a2", 3), ("D", 2, None, 4),
                               ("U", 5, "e", 5)]), epoch_id="e1")
    rows = sorted(
        (r["k"], r["_change_type"], r["v"])
        for r in table.changes(v1, preimages=True).collect()
    )
    assert rows == [
        (1, "U_post", "a2"), (1, "U_pre", "a"),
        (2, "D", "b"), (5, "I", "e"),
    ]


def test_incremental_agg_matches_recompute_with_group_migration(spark, table):
    """A key whose group column CHANGES between snapshots must move its
    contribution: U_pre decrements the old group, U_post the new."""
    from haskell_dbfunctor_spark.lake.incremental import (
        group_sums, maintain_group_sums,
    )

    table.merge(_batch(spark, [
        ("U", 1, "g1", 1), ("U", 2, "g1", 2), ("U", 3, "g2", 3),
    ]), epoch_id="e0")
    v1 = table.version
    base = group_sums(table.read(), ["v"], ["seq"])
    table.merge(_batch(spark, [
        ("U", 2, "g2", 10),   # migrates g1 -> g2, seq 2 -> 10
        ("D", 3, None, 11),   # g2 loses key 3
        ("U", 4, "g3", 12),   # new group appears
    ]), epoch_id="e1")
    maintained = {
        r["v"]: (r["n"], r["sum_seq"])
        for r in maintain_group_sums(
            base, table.changes(v1, preimages=True), ["v"], ["seq"]
        ).collect()
    }
    recomputed = {
        r["v"]: (r["n"], r["sum_seq"])
        for r in group_sums(table.read(), ["v"], ["seq"]).collect()
    }
    assert maintained == recomputed
    assert maintained == {"g1": (1, 1), "g2": (1, 10), "g3": (1, 12)}


def test_incremental_agg_null_groups_and_integer_sums(spark, table):
    """NULL group keys stay ONE group (union+hash-agg, not a null-
    unsafe join) and integer sum columns keep their type and NULL
    semantics — maintained == recomputed, schema included."""
    from haskell_dbfunctor_spark.lake.incremental import (
        group_sums, maintain_group_sums,
    )

    table.merge(_batch(spark, [
        ("U", 1, None, 1), ("U", 2, None, 2), ("U", 3, "g", 3),
    ]), epoch_id="e0")
    v1 = table.version
    base = group_sums(table.read(), ["v"], ["seq"])
    table.merge(_batch(spark, [
        ("D", 1, None, 4),      # NULL group loses a key
        ("U", 3, "g", 10),      # same group, new seq
    ]), epoch_id="e1")
    maintained = maintain_group_sums(
        base, table.changes(v1, preimages=True), ["v"], ["seq"]
    )
    recomputed = group_sums(table.read(), ["v"], ["seq"])
    # long stays long (nullability flags differ: sum() is nullable,
    # count(*) is not — values are what matters)
    assert [(f.name, f.dataType) for f in maintained.schema] == [
        (f.name, f.dataType) for f in recomputed.schema
    ]
    m = {r["v"]: (r["n"], r["sum_seq"]) for r in maintained.collect()}
    r_ = {r["v"]: (r["n"], r["sum_seq"]) for r in recomputed.collect()}
    assert m == r_
    assert m[None] == (1, 2)  # NULL group merged, not split


def test_changes_rejects_inverted_and_ahead_ranges(spark, table):
    from haskell_dbfunctor_spark.lake.table import LakeError

    table.merge(_batch(spark, [("U", 1, "a", 1)]), epoch_id="e0")
    table.merge(_batch(spark, [("U", 1, "b", 2)]), epoch_id="e1")
    with pytest.raises(LakeError, match="swapped"):
        table.changes(2, 1)
    with pytest.raises(LakeError, match="ahead"):
        table.changes_since(table.version + 1)


def test_incremental_agg_rejects_postimage_feed(spark, table):
    from haskell_dbfunctor_spark.lake.incremental import change_feed_delta

    table.merge(_batch(spark, [("U", 1, "a", 1)]), epoch_id="e0")
    v1 = table.version
    table.merge(_batch(spark, [("U", 1, "a2", 2)]), epoch_id="e1")
    with pytest.raises(Exception, match="preimage|_change_type"):
        change_feed_delta(
            table.changes(v1, preimages=False), ["v"], ["seq"]
        ).collect()


def test_changes_since_per_commit_granularity(spark, table):
    """changes_since preserves per-commit history where changes() nets
    it out: updated-twice appears twice; insert-then-delete appears."""
    table.merge(_batch(spark, [("U", 1, "a", 1)]), epoch_id="e0")
    v1 = table.version
    table.merge(_batch(spark, [("U", 1, "b", 2), ("U", 9, "x", 3)]),
                epoch_id="e1")
    table.merge(_batch(spark, [("U", 1, "c", 4), ("D", 9, None, 5)]),
                epoch_id="e2")
    rows = sorted(
        (r["_commit_version"], r["k"], r["_change_type"], r["v"])
        for r in table.changes_since(v1).collect()
    )
    assert rows == [
        (v1 + 1, 1, "U", "b"), (v1 + 1, 9, "I", "x"),
        (v1 + 2, 1, "U", "c"), (v1 + 2, 9, "D", "x"),
    ]
    # the NET diff cancels key 9 entirely and nets key 1 to one update
    net = sorted(
        (r["k"], r["_change_type"], r["v"])
        for r in table.changes(v1).collect()
    )
    assert net == [(1, "U", "c")]
    # up-to-date consumer gets an empty, correctly-shaped frame
    upto = table.changes_since(table.version)
    assert upto.count() == 0 and "_commit_version" in upto.columns


def test_maintenance_cli_changes_subcommand(spark, table, tmp_path):
    from jobs.lake_maintenance import main

    table.merge(_batch(spark, [("U", 1, "a", 1)]), epoch_id="e0")
    v1 = table.version
    table.merge(_batch(spark, [("U", 1, "a2", 2), ("U", 2, "b", 3)]),
                epoch_id="e1")
    out = str(tmp_path / "cdf_out")
    rc = main([
        "--table-root", table.root, "changes",
        "--from-version", str(v1), "--preimages", "--out", out,
    ])
    assert rc == 0
    rows = sorted(
        (r["k"], r["_change_type"]) for r in spark.read.parquet(out).collect()
    )
    assert rows == [(1, "U_post"), (1, "U_pre"), (2, "I")]


def test_changes_survives_rebucket(spark, table):
    table.merge(_batch(spark, [("U", 1, "a", 1), ("U", 2, "b", 2)]),
                epoch_id="e0")
    v1 = table.version
    table.rebucket(8)
    table.merge(_batch(spark, [("U", 2, "b2", 3)]), epoch_id="e1")
    ch = {r["k"]: r["_change_type"] for r in table.changes(v1).collect()}
    # rebucket rewrote the layout but not the logical state: only the
    # genuinely updated key appears
    assert ch == {2: "U"}
