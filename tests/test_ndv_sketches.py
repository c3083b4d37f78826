"""Per-file HLL NDV sketches (Iceberg Puffin analog): mergeable
approximate distinct counts maintained O(new files) per cycle, unioned
over live files at query time with no data scan.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.types as T
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.lake.table import MANIFEST_DIR, LakeTable

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.LongType()),
    T.StructField("s", T.StringType()),
])


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("v"),
        F.lit(None).cast("string").alias("s"),
        F.lit("U").alias("op"),
        F.col("id").alias("seq"),
    )


def _mk(spark, root):
    t = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=4)
    t.merge(_batch(spark, 0, 8000), epoch_id="e0")
    return t


def test_ndv_estimates_and_null_column(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    res = t.analyze_ndv(["k", "v", "s"])
    assert res["files_sketched"] > 0
    got = t.ndv()
    assert abs(got["k"]["estimate"] - 8000) <= 0.05 * 8000
    assert abs(got["v"]["estimate"] - 97) <= 10
    # all-NULL column: covered, zero cardinality
    assert got["s"]["estimate"] == 0
    assert got["s"]["files_covered"] == got["s"]["files_live"]
    # second run is a no-op (no snapshot burned)
    v = t.version
    res2 = t.analyze_ndv(["k", "v", "s"])
    assert res2["files_sketched"] == 0 and t.version == v


def test_ndv_incremental_after_merge(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.analyze_ndv(["k"])
    # a MoR append adds delta files (bases untouched): base sketches
    # stay valid and live; coverage full, estimate unchanged (deltas
    # are profiled only after compaction — documented contract)
    t.merge(_batch(spark, 8000, 9000), epoch_id="e1", mode="mor")
    got = t.ndv(["k"])
    assert got["k"]["files_covered"] == got["k"]["files_live"]
    # CoW compaction folds deltas and rewrites buckets -> new files
    # are uncovered until the next analyze
    t.compact()
    got = t.ndv(["k"])
    assert got["k"]["files_covered"] < got["k"]["files_live"]
    res = t.analyze_ndv(["k"])
    assert res["files_sketched"] > 0
    got = t.ndv(["k"])
    assert got["k"]["files_covered"] == got["k"]["files_live"]
    assert abs(got["k"]["estimate"] - 9000) <= 0.05 * 9000


def test_ndv_empty_without_analyze(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t2"))
    assert t.ndv() == {}


def test_ndv_blob_gc(spark, tmp_path):
    root = str(tmp_path / "t")
    t = _mk(spark, root)
    t.analyze_ndv(["k"])
    blob1 = t.manifest["ndv_ref"]
    t.merge(_batch(spark, 8000, 9000), epoch_id="e1")
    t.analyze_ndv(["k"])
    blob2 = t.manifest["ndv_ref"]
    assert blob2 != blob1
    meta = os.path.join(root, MANIFEST_DIR)
    # blob1 is still referenced by the older manifest on disk
    t.expire_snapshots(keep_last=1)
    old = time.time() - 7200
    for f in os.listdir(meta):
        if f.startswith("ndv-"):
            os.utime(os.path.join(meta, f), (old, old))
    t.remove_orphans(grace_seconds=3600)
    left = {f for f in os.listdir(meta) if f.startswith("ndv-")}
    assert blob2 in left and blob1 not in left
    assert t.ndv(["k"])["k"]["estimate"] > 0
