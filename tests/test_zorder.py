"""Z-order clustering compaction: multi-column file skipping.

A 1-D sort serves only its own column (every sibling file spans the
full range of the others); the Z-curve interleaves quantile-rank bits
so each file covers a small hyper-rectangle and range reads prune on
ANY clustered column. The test builds a full 32x32 (x, y) grid so the
two columns are exactly independent, compacts one twin with
zorder_by=["x","y"] and one with sort_by="x", and compares pruning.
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
    T.StructField("x", T.LongType()),
    T.StructField("y", T.LongType()),
    T.StructField("ts", T.TimestampType()),
])


def _mk(spark, root):
    t = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=1)
    grid = spark.range(1024).select(
        F.col("id").alias("k"),
        (F.col("id") % 32).alias("x"),
        ((F.col("id") / 32).cast("long") % 32).alias("y"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
        F.lit("U").alias("op"),
        F.col("id").alias("seq"),
    )
    t.merge(grid, epoch_id="e0")
    return t


def _pruned(t, col, lo, hi):
    rows = sorted(r["k"] for r in t.read_where(col, lo, hi).collect())
    full = sorted(
        r["k"]
        for r in t.read().where(f"{col} >= {lo} AND {col} <= {hi}").collect()
    )
    assert rows == full  # pruning never changes the answer
    return t.last_pruned_files


def test_zorder_prunes_on_every_clustered_column(spark, tmp_path):
    zt = _mk(spark, str(tmp_path / "z"))
    before = sorted(r["k"] for r in zt.read().collect())
    res = zt.compact(zorder_by=["x", "y"], target_file_bytes=900)
    # enough hyper-rectangles for the pruning assertions below to be
    # meaningful (exact count shifts with parquet encoding details,
    # e.g. INT96 vs TIMESTAMP_MICROS timestamps)
    assert res["files_after"] >= 12
    assert sorted(r["k"] for r in zt.read().collect()) == before
    zt.analyze(["x", "y"])
    n_files = sum(len(f) for f in zt.manifest["buckets"].values())
    px = _pruned(zt, "x", 0, 3)
    py = _pruned(zt, "y", 0, 3)
    # a 1/8 slice on either axis must skip most hyper-rectangles
    assert px >= n_files // 2, (px, n_files)
    assert py >= n_files // 2, (py, n_files)

    lt = _mk(spark, str(tmp_path / "lin"))
    lt.compact(sort_by="x", target_file_bytes=900)
    lt.analyze(["x", "y"])
    lx = _pruned(lt, "x", 0, 3)
    ly = _pruned(lt, "y", 0, 3)
    assert lx > 0      # the sorted column prunes
    assert ly == 0     # ...and the other column cannot
    assert py > ly     # the Z-order advantage, concretely


def test_zorder_guards(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    with pytest.raises(LakeError):
        t.compact(zorder_by=["x"], sort_by="y")
    with pytest.raises(LakeError):
        t.compact(zorder_by=["nope"])
