"""Optimistic concurrency: multiple writers against one table root.

The manifest version number is claimed by an atomic CAS
(os.link — EEXIST on loss), so a lost update is impossible by
construction: a loser either REBASES (its touched buckets are disjoint
from every intermediate commit — data files stay valid, manifest is
rebuilt on the winner's) or RE-EXECUTES the whole operation against
the winner's snapshot (serializable isolation). Epoch idempotence
holds across writers. This mirrors Iceberg's optimistic commit
protocol; the reference engine is single-process in-memory and has no
analog — concurrency is part of the lake recast of its RTabular seam.
"""

import os
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.types as T
from pyspark.sql import functions as F
import pytest

from haskell_dbfunctor_spark.lake.table import CommitConflict, LakeTable

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])


def _batch(spark, ks, tag, ts_base=1_700_000_000):
    rows = [(int(k), f"{tag}{k}") for k in ks]
    df = spark.createDataFrame(rows, "k long, v string")
    return df.select(
        "k", "v",
        F.timestamp_seconds(F.lit(ts_base) + F.col("k")).alias("ts"),
        F.lit("U").alias("op"),
        F.col("k").alias("seq"),
    )


def _state(table):
    return sorted(tuple(r) for r in table.read().select("k", "v").collect())


def _keys_by_bucket(table, n=40):
    """Map candidate keys 0..n-1 to their bucket ids."""
    df = table.spark.range(n).select(
        F.col("id").alias("k"), table.bucket_of(F.col("id")).alias("b")
    )
    out = {}
    for r in df.collect():
        out.setdefault(r["b"], []).append(r["k"])
    return out


def test_stale_handle_disjoint_buckets_rebases(spark, tmp_path):
    """Two handles fork from v0; the second (stale) writer touches only
    buckets the first never wrote — its commit must rebase, not fail,
    and neither batch may be lost."""
    root = str(tmp_path / "t")
    t1 = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=4)
    by_bucket = _keys_by_bucket(t1)
    buckets = sorted(by_bucket)
    assert len(buckets) >= 2
    ks_a, ks_b = by_bucket[buckets[0]][:3], by_bucket[buckets[1]][:3]

    t2 = LakeTable.load(spark, root)  # forks at v0
    assert t1.merge(_batch(spark, ks_a, "a"), epoch_id="ea").version == 1
    # t2 still believes v0; its CAS on v1 loses -> rebase onto t1's v1
    st = t2.merge(_batch(spark, ks_b, "b"), epoch_id="eb")
    assert st.version == 2 and not st.skipped
    final = LakeTable.load(spark, root)
    assert final.version == 2
    assert set(final.applied_epochs()) == {"ea", "eb"}
    assert _state(final) == sorted(
        [(k, f"a{k}") for k in ks_a] + [(k, f"b{k}") for k in ks_b]
    )


def test_stale_handle_overlapping_buckets_reexecutes(spark, tmp_path):
    """Stale writer updates the SAME key the winner just wrote: rebase
    is illegal (its CoW output was computed against a stale base and
    would resurrect pre-winner state for every other row in the
    bucket); the merge must re-execute and produce the serial result."""
    root = str(tmp_path / "t")
    t1 = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=2)
    t1.merge(_batch(spark, range(8), "seed"), epoch_id="seed")

    t2 = LakeTable.load(spark, root)
    t1.merge(_batch(spark, [3], "x"), epoch_id="ex")      # v2
    st = t2.merge(_batch(spark, [3, 4], "y"), epoch_id="ey")  # stale: re-executes
    assert st.version == 3 and not st.skipped
    final = LakeTable.load(spark, root)
    got = dict(_state(final))
    # serial order ea -> ey: y overwrites x on k=3, seeds survive elsewhere
    assert got[3] == "y3" and got[4] == "y4" and got[0] == "seed0"
    assert len(got) == 8


def test_raced_duplicate_epoch_skips_not_doubles(spark, tmp_path):
    """Two writers race the SAME epoch id (duplicate delivery): the
    loser must observe the winner's applied_epochs during conflict
    handling and no-op, both when its buckets overlap and when they
    don't."""
    root = str(tmp_path / "t")
    t1 = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=2)
    t2 = LakeTable.load(spark, root)
    t1.merge(_batch(spark, [1, 2], "a"), epoch_id="e1")
    st = t2.merge(_batch(spark, [1, 2], "DUP"), epoch_id="e1")
    assert st.skipped
    final = LakeTable.load(spark, root)
    assert final.version == 1
    assert dict(_state(final)) == {1: "a1", 2: "a2"}


def test_exhausted_retries_raise_commit_conflict(spark, tmp_path):
    root = str(tmp_path / "t")
    t1 = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=2)
    t1.merge(_batch(spark, range(4), "a"), epoch_id="e0")
    t2 = LakeTable.load(spark, root)
    t1.merge(_batch(spark, [0], "b"), epoch_id="e1")
    with pytest.raises(CommitConflict):
        t2.merge(_batch(spark, [0], "c"), epoch_id="e2", conflict_retries=0)


def test_concurrent_threads_no_lost_updates(spark, tmp_path):
    """3 writer threads x 2 epochs each, each with its own table
    handle, all racing real CAS commits. Every epoch must land exactly
    once, versions must stay contiguous, and the final state must be
    the union of all batches (keys are writer-disjoint)."""
    root = str(tmp_path / "t")
    LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=4)
    errors = []

    def writer(wid):
        try:
            t = LakeTable.load(spark, root)
            for e in range(2):
                ks = [wid * 100 + e * 10 + i for i in range(3)]
                st = t.merge(
                    _batch(spark, ks, f"w{wid}e{e}-"),
                    epoch_id=f"w{wid}-e{e}",
                    conflict_retries=30,
                )
                assert not st.skipped
        except Exception as ex:  # pragma: no cover - surfaced below
            errors.append((wid, ex))

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(3)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors

    final = LakeTable.load(spark, root)
    assert final.version == 6  # 6 commits, contiguous CAS-claimed versions
    assert set(final.applied_epochs()) == {
        f"w{w}-e{e}" for w in range(3) for e in range(2)
    }
    expect = sorted(
        (w * 100 + e * 10 + i, f"w{w}e{e}-{w * 100 + e * 10 + i}")
        for w in range(3) for e in range(2) for i in range(3)
    )
    assert _state(final) == expect
    # every intermediate snapshot is loadable (contiguous history for
    # changes_since consumers)
    for v in range(7):
        LakeTable.load(spark, root, v)


def test_property_concurrent_writers_serializable(spark, tmp_path):
    """Serializability under contention: 3 writers x 3 epochs over a
    SMALL shared key space (overlap guaranteed -> real conflicts and
    re-executions), raced concurrently. The outcome must equal a
    sequential replay of the same epochs in their actual COMMIT order
    (read back from the manifest versions) — i.e., the concurrent
    schedule is equivalent to the serial history the commits claim."""
    import random

    rng = random.Random(11)
    root = str(tmp_path / "t")
    LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=4)
    batches = {
        f"w{w}-e{e}": [
            (rng.randrange(30), f"w{w}e{e}") for _ in range(6)
        ]
        for w in range(3) for e in range(3)
    }
    errors = []

    def writer(wid):
        try:
            t = LakeTable.load(spark, root)
            for e in range(3):
                eid = f"w{wid}-e{e}"
                rows = [(k, f"{tag}:{k}") for k, tag in batches[eid]]
                df = spark.createDataFrame(rows, "k long, v string").select(
                    "k", "v",
                    F.timestamp_seconds(F.lit(1_700_000_000)).alias("ts"),
                    F.lit("U").alias("op"),
                    F.lit(e).cast("long").alias("seq"),
                )
                t.merge(df, epoch_id=eid, conflict_retries=40)
        except Exception as ex:  # pragma: no cover
            errors.append((wid, ex))

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(3)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors

    final = LakeTable.load(spark, root)
    applied = final.applied_epochs()
    assert set(applied) == set(batches)
    # replay the SAME epochs sequentially in their claimed commit order
    twin = LakeTable.create(spark, str(tmp_path / "twin"), SCHEMA,
                            key_cols=["k"], num_buckets=4)
    for eid in sorted(applied, key=lambda e: applied[e]["version"]):
        rows = [(k, f"{tag}:{k}") for k, tag in batches[eid]]
        df = spark.createDataFrame(rows, "k long, v string").select(
            "k", "v",
            F.timestamp_seconds(F.lit(1_700_000_000)).alias("ts"),
            F.lit("U").alias("op"),
            F.lit(int(eid[-1])).cast("long").alias("seq"),
        )
        twin.merge(df, epoch_id=eid)
    assert _state(final) == _state(twin)


def test_compaction_races_merge(spark, tmp_path):
    """A stale handle compacts while another writer merged in between:
    the compaction must either rebase or re-plan, and the logical state
    must be exactly the merge winner's."""
    root = str(tmp_path / "t")
    t1 = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=2)
    for i in range(3):  # fragment files
        t1.merge(
            _batch(spark, range(i * 10, i * 10 + 10), f"s{i}-"),
            epoch_id=f"s{i}", files_per_bucket=4, target_file_bytes=1,
        )
    t2 = LakeTable.load(spark, root)  # stale at v3
    t1.merge(_batch(spark, [5], "new"), epoch_id="late")  # v4
    before = _state(LakeTable.load(spark, root))
    res = t2.compact()
    assert res["version"] == 5
    final = LakeTable.load(spark, root)
    assert _state(final) == before  # pure layout change, winner's data kept
    assert dict(_state(final))[5] == "new5"


def test_mor_append_race_same_bucket_reexecutes(spark, tmp_path):
    """MoR deltas bake __commit_seq (base version + 1) into the data
    files, so a stale append into a bucket another writer just touched
    MUST re-execute with a fresh seq — rebasing would leave two deltas
    whose seq ordering contradicts commit order (the stale one would
    shadow the winner on read). num_buckets=1 forces the overlap."""
    root = str(tmp_path / "t")
    t1 = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=1)
    t1.merge(_batch(spark, range(4), "seed"), epoch_id="seed")
    t2 = LakeTable.load(spark, root)
    t1.merge(_batch(spark, [2], "win"), epoch_id="w", mode="mor")   # v2
    st = t2.merge(_batch(spark, [2, 3], "late"), epoch_id="l", mode="mor")
    assert st.version == 3 and not st.skipped
    final = LakeTable.load(spark, root)
    got = dict(_state(final))
    # serial order w -> l: the re-executed delta's seq must beat w's
    assert got[2] == "late2" and got[3] == "late3" and got[0] == "seed0"
    # and folding the deltas preserves exactly that state
    final.compact_deltas()
    assert dict(_state(LakeTable.load(spark, root)))[2] == "late2"


def test_orphan_snapshot_dirs_cleaned_on_reexecute(spark, tmp_path):
    """A re-executed merge must not leak the failed attempt's data
    files: the orphan snapshot dir is deleted before re-execution."""
    root = str(tmp_path / "t")
    t1 = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=1)
    t1.merge(_batch(spark, range(4), "a"), epoch_id="e0")
    t2 = LakeTable.load(spark, root)
    t1.merge(_batch(spark, [0], "b"), epoch_id="e1")
    t2.merge(_batch(spark, [1], "c"), epoch_id="e2")  # conflict -> re-execute
    final = LakeTable.load(spark, root)
    live = {
        os.path.realpath(os.path.join(root, f))
        for m in (
            LakeTable.load(spark, root, v).manifest for v in range(4)
        )
        for files in list(m["buckets"].values())
        + list(m.get("delta_files", {}).values())
        for f in files
    }
    on_disk = {
        os.path.realpath(os.path.join(dp, f))
        for dp, _, fns in os.walk(os.path.join(root, "data"))
        for f in fns if f.endswith(".parquet")
    }
    assert on_disk == live  # no orphaned attempt files
    assert dict(_state(final))[0] == "b0" and dict(_state(final))[1] == "c1"
