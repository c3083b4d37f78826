"""Declared CHECK constraints (manifest-stored expectations) and the
files/snapshots metadata tables."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.lake.table import LakeError, LakeTable

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
    T.StructField("n", T.LongType()),
    T.StructField("ts", T.TimestampType()),
])


def _batch(spark, rows):
    """rows: (k, v, n, seq)."""
    df = spark.createDataFrame(rows, "k long, v string, n long, seq long")
    return df.select(
        "k", "v", "n",
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("seq")).alias("ts"),
        F.lit("U").alias("op"), "seq",
    )


def test_declared_constraints_gate_every_merge(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key_cols=["k"], num_buckets=2,
        constraints={"n_nonneg": "n >= 0"},
    )
    st = t.merge(_batch(spark, [(1, "a", 5, 1), (2, "b", -1, 1)]),
                 epoch_id="e0")  # no per-call expectations needed
    assert st.extra["quarantined"] == 1
    assert {r["k"] for r in t.read().collect()} == {1}
    assert t.quarantine().count() == 1
    # call-site expectations COMBINE with declared ones
    st = t.merge(
        _batch(spark, [(3, "", 1, 2), (4, "d", -9, 2)]),
        epoch_id="e1",
        expectations={"v_not_blank": F.col("v") != ""},
    )
    assert st.extra["quarantined"] == 2
    assert {r["k"] for r in t.read().collect()} == {1}


def test_constraint_ddl_and_partial_batches(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         key_cols=["k"], num_buckets=2)
    t.add_constraint("n_nonneg", "n >= 0")
    with pytest.raises(Exception):
        t.add_constraint("bad", "not valid sql ((")
    st = t.merge(_batch(spark, [(1, "a", -5, 1)]), epoch_id="e0")
    assert st.extra["quarantined"] == 1
    t.merge(_batch(spark, [(1, "a", 5, 2)]), epoch_id="e1")
    # a MoR partial patch NOT carrying n can't violate n's constraint
    patch = spark.createDataFrame([(1, "patched")], "k long, v string").select(
        "k", "v", F.lit("U").alias("op"), F.lit(3).alias("seq"),
    )
    st = t.merge(patch, epoch_id="e2", mode="mor", partial=True)
    assert not st.skipped
    row = t.read().collect()[0]
    assert (row["v"], row["n"]) == ("patched", 5)
    # drop: violations stop quarantining
    t.drop_constraint("n_nonneg")
    t.merge(_batch(spark, [(9, "z", -1, 9)]), epoch_id="e3")
    assert {r["k"] for r in t.read().collect()} == {1, 9}
    with pytest.raises(LakeError):
        t.drop_constraint("nope")


def test_metadata_tables(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA,
                         key_cols=["k"], num_buckets=2)
    t.merge(_batch(spark, [(i, f"v{i}", i, 1) for i in range(8)]),
            epoch_id="e0")
    t.merge(_batch(spark, [(1, "x", 1, 2)]), epoch_id="e1", mode="mor",
            partial=False)
    t.analyze(["n"])

    files = t.files_df().collect()
    live = {
        rel for fl in t.manifest["buckets"].values() for rel in fl
    }
    assert {r["file"] for r in files if r["kind"] == "base"} == live
    assert sum(1 for r in files if r["kind"] == "delta") == 1
    assert all(r["n_bytes"] > 0 for r in files)
    assert any("n" in r["stats_cols"] for r in files if r["kind"] == "base")

    snaps = {r["version"]: r for r in t.snapshots_df().collect()}
    assert set(snaps) == {0, 1, 2, 3}
    assert snaps[3]["n_applied_epochs"] == 2  # analyze commit carries epochs
    assert snaps[2]["n_delta_files"] == 1
    assert not any(r["staged"] for r in snaps.values())
