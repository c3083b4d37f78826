"""Lake maintenance: file compaction (Iceberg rewrite_data_files
analog) and bucket-count rescale. Both are pure layout changes — data
must be bit-identical before/after — committed as new snapshots so old
snapshots keep reading until expire_snapshots."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.types as T
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.lake.table import LakeTable

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])


def _table_with_fragmented_files(spark, root, n_merges=2, rows_per=200):
    """Merges with a 1-byte target file size force the maximum write
    split (files_per_bucket files per bucket via the within-bucket
    subsplit) — the fragmented layout a long byte-heavy ingest leaves."""
    table = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=4)
    for i in range(n_merges):
        batch = spark.range(i * rows_per, (i + 1) * rows_per).select(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), F.col("id")).alias("v"),
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
            F.lit("U").alias("op"),
            F.col("id").alias("seq"),
        )
        table.merge(
            batch, epoch_id=f"e{i}", files_per_bucket=4, target_file_bytes=1
        )
    return table


def _state(table):
    return sorted(tuple(r) for r in table.read().select("k", "v").collect())


def test_compact_coalesces_files_and_preserves_data(spark, tmp_path):
    table = _table_with_fragmented_files(spark, str(tmp_path / "t"))
    before = _state(table)
    files_before = sum(len(f) for f in table.manifest["buckets"].values())
    v_before = table.version

    res = table.compact(min_files=2)
    assert res["buckets_compacted"] > 0
    assert res["files_after"] < res["files_before"]
    assert table.version == v_before + 1
    assert _state(table) == before  # bit-identical data

    files_after = sum(len(f) for f in table.manifest["buckets"].values())
    assert files_after < files_before
    # old snapshot still readable (copy-on-write) until expiry
    old = LakeTable.load(spark, str(tmp_path / "t"), version=v_before)
    assert _state(old) == before
    # idempotent-ish: a second compact finds nothing above threshold
    res2 = table.compact(min_files=2)
    assert res2["buckets_compacted"] == 0 or res2["files_after"] <= res2["files_before"]


def test_compact_then_merge_still_works(spark, tmp_path):
    table = _table_with_fragmented_files(spark, str(tmp_path / "t2"))
    table.compact(min_files=2)
    upd = spark.createDataFrame(
        [("U", 0, "UPDATED", 1_800_000_000, 10_000)],
        "op string, k long, v string, ts_s long, seq long",
    ).select(
        "op", "k", "v",
        F.timestamp_seconds("ts_s").alias("ts"), "seq",
    )
    table.merge(upd, epoch_id="post-compact")
    got = {r["k"]: r["v"] for r in table.read().collect()}
    assert got[0] == "UPDATED" and got[1] == "v1"


def test_rebucket_rescales_layout_and_preserves_data(spark, tmp_path):
    table = _table_with_fragmented_files(spark, str(tmp_path / "t3"))
    before = _state(table)
    res = table.rebucket(16)
    assert res["num_buckets"] == 16 and table.num_buckets == 16
    assert _state(table) == before
    # buckets map uses the new modulus: every row's bucket matches
    df = table.read().withColumn(
        "b", F.pmod(F.xxhash64("k"), F.lit(16)).cast("int")
    )
    n_buckets_used = df.select("b").distinct().count()
    assert 1 < n_buckets_used <= 16
    # merges keep working against the rescaled layout
    upd = spark.createDataFrame(
        [("U", 1, "RESCALED", 1_800_000_000, 10_001)],
        "op string, k long, v string, ts_s long, seq long",
    ).select("op", "k", "v", F.timestamp_seconds("ts_s").alias("ts"), "seq")
    table.merge(upd, epoch_id="post-rebucket")
    got = {r["k"]: r["v"] for r in table.read().collect()}
    assert got[1] == "RESCALED"


def test_crash_before_commit_is_invisible_and_retryable(spark, tmp_path):
    """Exactly-once under crash/retry: a merge that dies AFTER writing
    its snapshot files but BEFORE the manifest commit leaves the table
    bit-identical (readers still see the old snapshot), and retrying
    the same epoch converges to the same state a crash-free run
    produces — the atomic-rename manifest is the commit point."""
    import pytest

    def batch(lo, hi, tag):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"),
            F.concat(F.lit(tag), F.col("id")).alias("v"),
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
            F.lit("U").alias("op"),
            F.col("id").alias("seq"),
        )

    root = str(tmp_path / "crash")
    table = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=4)
    table.merge(batch(0, 100, "a"), epoch_id="e0")
    v0 = table.version
    state0 = _state(table)

    # crash injection: _commit raises before touching any manifest file
    real_commit = table._commit
    def exploding_commit(manifest):
        raise RuntimeError("simulated crash before manifest commit")
    table._commit = exploding_commit
    with pytest.raises(RuntimeError):
        table.merge(batch(50, 150, "b"), epoch_id="e1")
    table._commit = real_commit

    # nothing visible changed: version, state, and a fresh load agree
    assert table.version == v0
    assert _state(table) == state0
    assert LakeTable.load(spark, root).version == v0
    assert "e1" not in table.applied_epochs()

    # retry converges; compare against a crash-free twin
    table.merge(batch(50, 150, "b"), epoch_id="e1")
    twin = LakeTable.create(
        spark, str(tmp_path / "twin"), SCHEMA, key_cols=["k"], num_buckets=4
    )
    twin.merge(batch(0, 100, "a"), epoch_id="e0")
    twin.merge(batch(50, 150, "b"), epoch_id="e1")
    assert _state(table) == _state(twin)
    # and a re-apply of the committed epoch is a no-op (idempotent)
    assert table.merge(batch(50, 150, "b"), epoch_id="e1").skipped


def test_remove_orphans_cleans_crashed_attempts(spark, tmp_path):
    """A writer that dies between its snapshot write and its commit
    leaves files no manifest references; remove_orphans deletes them
    after the grace window and never touches referenced or
    younger-than-grace files."""
    import time as _time

    table = _table_with_fragmented_files(spark, str(tmp_path / "t"),
                                         n_merges=1)
    # crash injection: the snapshot directory is written, the commit is not
    saved = LakeTable._commit
    def boom(self, manifest):
        raise RuntimeError("crash before manifest commit")
    LakeTable._commit = boom
    batch = spark.range(500, 520).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
        F.timestamp_seconds(F.lit(1_700_000_000)).alias("ts"),
        F.lit("U").alias("op"), F.col("id").alias("seq"),
    )
    try:
        with __import__("pytest").raises(RuntimeError):
            table.merge(batch, epoch_id="crash")
    finally:
        LakeTable._commit = saved

    data_dir = os.path.join(table.root, "data")
    all_files = lambda: {  # noqa: E731
        os.path.join(dp, f)
        for dp, _, fs in os.walk(data_dir) for f in fs
        if f.endswith(".parquet")
    }
    live = {
        os.path.realpath(os.path.join(table.root, f))
        for fl in table.manifest["buckets"].values() for f in fl
    }
    orphans = {p for p in all_files() if os.path.realpath(p) not in live}
    assert orphans  # the crashed attempt left files

    # inside grace: nothing is deleted
    res = table.remove_orphans(grace_seconds=3600)
    assert res["removed_files"] == 0 and res["kept_in_grace"] >= len(orphans)
    # age the orphans past the grace and sweep
    for p in orphans:
        os.utime(p, (1, 1))
    # VACUUM DRY RUN first: reports the exact candidates, deletes nothing
    dry = table.remove_orphans(grace_seconds=60, dry_run=True)
    assert dry["dry_run"] and dry["removed_files"] == len(orphans)
    assert {
        os.path.realpath(os.path.join(table.root, c))
        for c in dry["candidates"]
    } == {os.path.realpath(p) for p in orphans}
    assert orphans <= all_files()  # nothing deleted
    res = table.remove_orphans(grace_seconds=60)
    assert res["removed_files"] == len(orphans)
    assert all_files() == {p for p in all_files() if os.path.realpath(p) in live}
    before = _state(table)
    assert _state(LakeTable.load(spark, table.root)) == before


def test_set_properties_and_cli(spark, tmp_path):
    from jobs.lake_maintenance import main

    """ALTER TABLE SET/UNSET TBLPROPERTIES: metadata-only commit that
    takes effect on the next consumer (here: epoch retention pruning
    activates on an EXISTING table)."""
    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    sch = T.StructType([
        T.StructField("k", T.LongType()), T.StructField("v", T.StringType()),
    ])
    t = LakeTable.create(spark, str(tmp_path / "p"), sch, key_cols=["k"],
                         num_buckets=2)

    def batch(i):
        return spark.createDataFrame([(i, f"v{i}")], "k long, v string")

    for i in range(4):
        t.merge(batch(i), epoch_id=f"e{i}", op_col=None, order_cols=())
    assert len(t.applied_epochs()) == 4
    res = t.set_properties({"epochs.retention-count": "2"})
    assert res["properties"]["epochs.retention-count"] == "2"
    t.merge(batch(9), epoch_id="e9", op_col=None, order_cols=())
    assert len(t.applied_epochs()) == 2  # retention active on old table
    # unset restores unbounded growth
    t.set_properties({"epochs.retention-count": None})
    assert "epochs.retention-count" not in t.properties
    t.merge(batch(10), epoch_id="e10", op_col=None, order_cols=())
    assert len(t.applied_epochs()) == 3
    # CLI form
    rc = main(["--table-root", t.root, "set-props", "foo=bar",
               "epochs.retention-count=5"])
    assert rc == 0
    fresh = LakeTable.load(spark, t.root)
    assert fresh.properties["foo"] == "bar"
    rc = main(["--table-root", t.root, "set-props", "foo"])
    assert rc == 0
    assert "foo" not in LakeTable.load(spark, t.root).properties
    # staged handles must not commit property DDL
    import pytest

    from haskell_dbfunctor_spark.lake.table import LakeError

    t.merge(batch(11), epoch_id="s1", stage_only=True, op_col=None,
            order_cols=())
    with pytest.raises(LakeError):
        t.set_properties({"x": "1"})


def test_describe_cli(spark, tmp_path, capsys):
    import json as _json

    import pyspark.sql.types as T

    from jobs.lake_maintenance import main

    sch = T.StructType([
        T.StructField("k", T.LongType()), T.StructField("v", T.StringType()),
    ])
    t = LakeTable.create(spark, str(tmp_path / "d"), sch, key_cols=["k"],
                         num_buckets=2)
    t.merge(spark.createDataFrame([(1, "a")], "k long, v string"),
            epoch_id="e1", op_col=None, order_cols=())
    rc = main(["--table-root", t.root, "describe"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["action"] == "describe"
    assert out["version"] == t.version and out["key_cols"] == ["k"]
    assert out["num_data_files"] >= 1
