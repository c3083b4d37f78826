"""Manifest-level Bloom filters: point-lookup file skipping on columns
bucket pruning can't serve (partial key / payload columns).

Contract: false negatives are impossible (a pruned file provably lacks
the value — probes hash through Spark so build and probe share JVM
xxhash64 bit-for-bit); false positives only cost an extra file read;
files without blooms are always read; MoR delta buckets collapse
before filtering; dead files' blooms are pruned from the manifest.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.types as T
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.lake.table import LakeTable

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("u", T.LongType()),    # probe column (not the key!)
    T.StructField("v", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])


def _batch(spark, ks, u_of, tag):
    rows = [(int(kk), int(u_of(kk)), f"{tag}{kk}") for kk in ks]
    df = spark.createDataFrame(rows, "k long, u long, v string")
    return df.select(
        "k", "u", "v",
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("k")).alias("ts"),
        F.lit("U").alias("op"), F.col("k").alias("seq"),
    )


def _mk(spark, root):
    t = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=4)
    # u = k // 50: each 50-key block shares one u value, and blocks are
    # spread over all buckets — so one u value lives in FEW rows of
    # MANY files, the worst case for bucket pruning (u is not the key)
    t.merge(_batch(spark, range(200), lambda kk: kk // 50, "a"), epoch_id="e0",
            files_per_bucket=2, target_file_bytes=1)
    return t


def _rows(df):
    return sorted(tuple(r) for r in df.select("k", "u", "v").collect())


def test_no_false_negatives_and_skipping(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    res = t.analyze_bloom(["u"])
    assert res["files_analyzed"] > 0
    n_files = sum(len(f) for f in t.manifest["buckets"].values())
    for probe in range(4):
        expect = _rows(t.read().where(F.col("u") == probe))
        got = _rows(t.read_where_eq("u", probe))
        assert got == expect and len(got) == 50
    # an absent value prunes EVERY file (modulo bloom false positives;
    # 8192 bits / ~few hundred positions makes FPs ~0 here)
    assert _rows(t.read_where_eq("u", 999)) == []
    assert t.last_pruned_files == n_files


def test_unanalyzed_files_are_read_and_incremental_analyze(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.analyze_bloom(["u"])
    # a merge rewrites some buckets -> their new files have no bloom
    t.merge(_batch(spark, [7], lambda kk: 999, "new"), epoch_id="e1")
    got = _rows(t.read_where_eq("u", 999))
    assert got == [(7, 999, "new7")]  # found despite missing bloom
    before = {
        rel for rel, e in t.manifest.get("file_blooms", {}).items() if e
    }
    res = t.analyze_bloom(["u"])
    # only the files the merge wrote get analyzed
    assert 0 < res["files_analyzed"] <= sum(
        len(f) for f in t.manifest["buckets"].values()
    ) - len([r for r in before if r in {
        rel for fl in t.manifest["buckets"].values() for rel in fl
    }])
    t2 = LakeTable.load(spark, t.root)
    assert _rows(t2.read_where_eq("u", 999)) == [(7, 999, "new7")]


def test_mor_delta_buckets_collapse_before_probe(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.analyze_bloom(["u"])
    # patch k=3's u to 777 via a MoR partial patch (no base rewrite:
    # the stale base file still blooms u=0 for k=3)
    patch = spark.createDataFrame([(3, 777)], "k long, u long").select(
        "k", "u", F.lit("U").alias("op"), F.lit(1).alias("seq")
    )
    t.merge(patch, epoch_id="p", mode="mor", partial=True)
    assert _rows(t.read_where_eq("u", 777)) == [(3, 777, "a3")]
    # and the OLD value no longer matches k=3
    old = _rows(t.read_where_eq("u", 0))
    assert (3, 0, "a3") not in old and len(old) == 49


def test_widened_column_invalidates_blooms_no_false_negatives(spark, tmp_path):
    """xxhash64 is physical-type-sensitive: a bloom built while `u`
    was int stores int-hash positions; after the column widens to
    long, a long-typed probe would MISS them — the stale bloom must be
    ignored (file read, correct answer), and re-analyze must rebuild
    it under the new type."""
    narrow = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("u", T.IntegerType()),
        T.StructField("v", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    t = LakeTable.create(spark, str(tmp_path / "t"), narrow,
                         key_cols=["k"], num_buckets=2)
    b = spark.createDataFrame(
        [(i, i // 10, f"a{i}") for i in range(40)],
        "k long, u int, v string",
    ).select(
        "k", "u", "v",
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("k")).alias("ts"),
        F.lit("U").alias("op"), F.col("k").alias("seq"),
    )
    t.merge(b, epoch_id="e0")
    t.analyze_bloom(["u"])
    assert len(_rows(t.read_where_eq("u", 2))) == 10
    # widen u via a bigint batch
    wide = spark.createDataFrame([(100, 7)], "k long, u bigint").select(
        "k", "u", F.lit("w").alias("v"),
        F.timestamp_seconds(F.lit(1_700_000_100)).alias("ts"),
        F.lit("U").alias("op"), F.lit(100).alias("seq"),
    )
    t.merge(wide, epoch_id="e1")
    assert t.schema["u"].dataType.simpleString() == "bigint"
    # stale int-typed blooms must NOT produce false negatives
    got = _rows(t.read_where_eq("u", 2))
    assert len(got) == 10
    # rebuild: every file re-analyzed under the new type, pruning back
    res = t.analyze_bloom(["u"])
    assert res["files_analyzed"] == sum(
        len(f) for f in t.manifest["buckets"].values()
    )
    assert len(_rows(t.read_where_eq("u", 2))) == 10
    assert _rows(t.read_where_eq("u", 999)) == []
    assert t.last_pruned_files > 0


def test_dead_files_blooms_pruned_from_manifest(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.analyze_bloom(["u"])
    t.compact()  # rewrites fragmented buckets -> old files dead
    live = {rel for fl in t.manifest["buckets"].values() for rel in fl}
    assert set(t.manifest.get("file_blooms", {})) <= live
    # correctness unaffected (new files unanalyzed -> read)
    assert len(_rows(t.read_where_eq("u", 1))) == 50
