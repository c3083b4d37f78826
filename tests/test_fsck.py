"""fsck (lake/fsck.py) — report-only integrity verification.

Pins: a healthy table is clean at both tiers; each injected corruption
class (deleted data file, deleted sidecar, misplaced row, duplicate
key, lineage HWM regression) is detected and named; dead DV refs are a
WARNING (the carried-refs rule), never an error; fsck never mutates.
"""

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest
from pyspark.sql import functions as F, types as T

from haskell_dbfunctor_spark.lake.dml import delete_where
from haskell_dbfunctor_spark.lake.fsck import fsck
from haskell_dbfunctor_spark.lake.table import BUCKET_COL, LakeTable

SCHEMA = T.StructType([
    T.StructField("k", T.LongType(), False),
    T.StructField("val", T.LongType(), True),
])


def _mk(spark, root, n=40, num_buckets=4, **create_kw) -> LakeTable:
    t = LakeTable.create(
        spark, str(root), SCHEMA, key_cols=["k"],
        num_buckets=num_buckets, **create_kw,
    )
    df = (
        spark.range(n)
        .select(F.col("id").alias("k"), (F.col("id") * 10).alias("val"))
        .withColumn("op", F.lit("U"))
        .withColumn("seq", F.col("k"))
    )
    t.merge(df, epoch_id="seed", order_cols=("seq",), drop_cols=("seq",))
    return t


def test_fsck_clean_both_tiers(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    res = fsck(t)
    assert res["ok"] and res["errors"] == []
    assert res["checked"]["data"] > 0
    deep = fsck(t, deep=True)
    assert deep["ok"], deep["errors"]
    assert deep["checked"]["live_keys"] == 40
    assert deep["checked"]["rows_scanned"] == 40


def test_fsck_detects_missing_data_file(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    victim = next(
        f for fl in t.manifest["buckets"].values() for f in fl
    )
    os.remove(os.path.join(t.root, victim))
    res = fsck(t)
    assert not res["ok"]
    assert any("missing file" in e and victim in e for e in res["errors"])


def test_fsck_detects_missing_sidecar(spark, tmp_path):
    t = _mk(
        spark, tmp_path / "t",
        properties={"metadata.spill-bytes": "1"},
    )
    # force a spill commit so bucket_refs exist
    t.merge(
        spark.range(5).select(
            F.col("id").alias("k"), F.lit(1).alias("val")
        ).withColumn("op", F.lit("U")).withColumn("seq", F.col("k")),
        epoch_id="e2", order_cols=("seq",), drop_cols=("seq",),
    )
    raw = json.load(open(os.path.join(t.root, "metadata",
                                      f"v{t.version}.json")))
    refs = raw.get("bucket_refs") or {}
    if not refs:
        pytest.skip("spill did not trigger at this size")
    victim = next(iter(refs.values()))
    os.remove(os.path.join(t.root, "metadata", victim))
    res = fsck(t)
    assert not res["ok"]
    assert any(victim in e for e in res["errors"])


def test_fsck_dead_dv_refs_warn_not_error(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    delete_where(t, "val >= 300", mode="dv")
    # CoW merge rewrites SOME buckets; file-level survivors keep refs.
    # Force dead refs the documented way: a dml CoW update rewrites
    # match-bearing files but KEEPS the bucket's dv refs.
    from haskell_dbfunctor_spark.lake.dml import update_where

    update_where(t, "val = 100", {"val": "101"})
    res = fsck(t)
    assert res["ok"], res["errors"]
    # dead refs may or may not exist depending on which files the
    # update touched; if any do, they must surface as warnings
    if any("dead" in w for w in res["warnings"]):
        assert not any("dv" in e for e in res["errors"])
    deep = fsck(t, deep=True)
    assert deep["ok"], deep["errors"]


def test_fsck_detects_misplaced_row(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=20)
    # graft a foreign parquet row into the wrong bucket dir: copy one
    # bucket's file into ANOTHER bucket's directory and reference it
    m = t.manifest
    bids = [b for b, fl in m["buckets"].items() if fl]
    src_b, dst_b = bids[0], bids[1]
    src_rel = m["buckets"][src_b][0]
    dst_dir = os.path.dirname(
        m["buckets"][dst_b][0]
    )
    graft_rel = os.path.join(dst_dir, "graft-misplaced.parquet")
    shutil.copy(
        os.path.join(t.root, src_rel), os.path.join(t.root, graft_rel)
    )
    m["buckets"][dst_b] = list(m["buckets"][dst_b]) + [graft_rel]
    res = fsck(t, deep=True)
    assert not res["ok"]
    assert any("placement" in e for e in res["errors"])
    assert any("uniqueness" in e for e in res["errors"])


def test_fsck_detects_lineage_hwm_regression(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", row_lineage=True)
    t.manifest["next_row_id"] = 1  # simulate a restored stale manifest
    res = fsck(t, deep=True)
    assert not res["ok"]
    assert any("allocator mark behind data" in e for e in res["errors"])


def test_fsck_chain_depth_and_epoch_log(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.merge(
        spark.range(3).select(
            F.col("id").alias("k"), F.lit(7).alias("val")
        ).withColumn("op", F.lit("U")).withColumn("seq", F.col("k")),
        epoch_id="e2", order_cols=("seq",), drop_cols=("seq",),
    )
    res = fsck(t)
    assert res["ok"]
    assert res["checked"]["chain_depth"] >= 1
    assert res["checked"]["epochs"] == 2


def test_fsck_cli_exit_codes(spark, tmp_path):
    from jobs.lake_maintenance import main

    t = _mk(spark, tmp_path / "t")
    assert main(["--table-root", t.root, "fsck"]) == 0
    victim = next(f for fl in t.manifest["buckets"].values() for f in fl)
    os.remove(os.path.join(t.root, victim))
    assert main(["--table-root", t.root, "fsck"]) == 3
