"""Schema evolution: numeric type widening (Iceberg type promotion).

Widening is metadata-only — old files keep their narrow physical type
and the parquet reader upcasts through the wider declared schema (probed
on this Spark build). Key columns never change type (bucket hashing is
physical-type-sensitive: xxhash64(int 5) != xxhash64(long 5)); narrow
batch KEYS are cast up to the table type before hashing instead.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.lake.table import LakeError, LakeTable

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("cnt", T.IntegerType()),
    T.StructField("score", T.FloatType()),
    T.StructField("ts", T.TimestampType()),
])


def _batch(spark, rows, cnt_type="int", score_type="float"):
    """rows: (k, cnt, score, seq)."""
    df = spark.createDataFrame(
        rows, f"k long, cnt {cnt_type}, score {score_type}, seq long"
    )
    return df.select(
        "k", "cnt", "score",
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("seq")).alias("ts"),
        F.lit("U").alias("op"), "seq",
    )


def _mk(spark, root):
    return LakeTable.create(spark, root, SCHEMA, key_cols=["k"],
                            num_buckets=2)


def test_widening_is_metadata_only(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.merge(_batch(spark, [(1, 10, 1.5, 1), (2, 20, 2.5, 1)]),
            epoch_id="e0")
    files_before = dict(t.manifest["buckets"])
    big = 2**40  # does not fit int32
    t.merge(
        _batch(spark, [(3, big, 3.5, 2)], cnt_type="bigint",
               score_type="double"),
        epoch_id="e1",
    )
    fresh = LakeTable.load(spark, t.root)
    assert fresh.schema["cnt"].dataType == T.LongType()
    assert fresh.schema["score"].dataType == T.DoubleType()
    got = {r["k"]: (r["cnt"], r["score"]) for r in fresh.read().collect()}
    assert got[3] == (big, 3.5)
    assert got[1] == (10, 1.5)  # old narrow files upcast at read
    # untouched bucket files were NOT rewritten
    untouched = [
        b for b in files_before
        if fresh.manifest["buckets"].get(b) == files_before[b]
    ]
    assert untouched  # at least the bucket e1 didn't hit


def test_narrow_batch_into_wide_table(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.merge(_batch(spark, [(1, 1, 1.0, 1)], cnt_type="bigint"),
            epoch_id="e0")  # widens cnt immediately
    st = t.merge(_batch(spark, [(1, 7, 9.0, 2)], cnt_type="int"),
                 epoch_id="e1")  # narrow update of the SAME key
    assert st.n_updated == 1  # key matched: narrow int key/cols coerced
    got = {r["k"]: r["cnt"] for r in t.read().collect()}
    assert got[1] == 7
    assert t.schema["cnt"].dataType == T.LongType()


def test_widening_under_mor(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.merge(_batch(spark, [(1, 1, 1.0, 1)]), epoch_id="e0", mode="mor")
    t.merge(_batch(spark, [(2, 2**40, 2.0, 2)], cnt_type="bigint"),
            epoch_id="e1", mode="mor")
    got = {r["k"]: r["cnt"] for r in t.read().collect()}
    assert got == {1: 1, 2: 2**40}
    t.compact_deltas()
    assert {r["k"]: r["cnt"] for r in t.read().collect()} == got


def test_key_type_change_rejected_but_narrow_key_cast(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"),
        SCHEMA, key_cols=["k"], num_buckets=4,
    )
    t.merge(_batch(spark, [(5, 1, 1.0, 1)]), epoch_id="e0")
    # narrow (int) batch KEY: cast up before hashing -> matches the
    # existing long key in its bucket (an uncast int would hash to a
    # different bucket and duplicate the key)
    nb = spark.createDataFrame([(5, 9)], "k int, cnt int").select(
        "k", "cnt", F.lit(2.0).cast("float").alias("score"),
        F.timestamp_seconds(F.lit(1_700_000_100)).alias("ts"),
        F.lit("U").alias("op"), F.lit(2).alias("seq"),
    )
    st = t.merge(nb, epoch_id="e1")
    assert st.n_updated == 1 and st.n_inserted == 0
    rows = t.read().collect()
    assert len(rows) == 1 and rows[0]["cnt"] == 9


def test_disallowed_changes_still_raise(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.merge(_batch(spark, [(1, 1, 1.0, 1)]), epoch_id="e0")
    bad = spark.createDataFrame([(2, "not-a-number")],
                                "k long, cnt string").select(
        "k", "cnt",
        F.timestamp_seconds(F.lit(1_700_000_000)).alias("ts"),
        F.lit("U").alias("op"), F.lit(1).alias("seq"),
    )
    with pytest.raises(LakeError):
        t.merge(bad, epoch_id="e1")
