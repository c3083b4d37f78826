"""Per-commit operation names + metrics (Delta ``DESCRIBE HISTORY``
``operation``/``operationMetrics`` analog): every commit path stamps
``op`` and an ``op_metrics`` manifest diff — files added/removed,
delta/DV files added, buckets touched, bytes added — computed
centrally at commit time with no Spark jobs."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.types as T
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.lake.dml import delete_where, update_where
from haskell_dbfunctor_spark.lake.table import LakeTable

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])


def _batch(spark, lo, hi, op="U"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
        F.lit(op).alias("op"),
        F.col("id").alias("seq"),
    )


def _hist(root):
    return {h["version"]: h for h in LakeTable.history(root)}


def test_create_and_merge_ops(spark, tmp_path):
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=4)
    t.merge(_batch(spark, 0, 200), epoch_id="e0")
    h = _hist(root)
    assert h[0]["op"] == "create"
    assert h[1]["op"] == "merge"
    m = h[1]["op_metrics"]
    assert m["files_added"] > 0
    assert m["bytes_added"] > 0
    assert 1 <= m["buckets_touched"] <= 4
    assert m["delta_files_added"] == 0
    assert m["dv_files_added"] == 0


def test_mor_merge_and_compact_deltas_ops(spark, tmp_path):
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=4)
    t.merge(_batch(spark, 0, 200), epoch_id="e0")
    t.merge(_batch(spark, 100, 300), epoch_id="e1", mode="mor")
    h = _hist(root)
    assert h[2]["op"] == "merge-mor"
    assert h[2]["op_metrics"]["delta_files_added"] > 0
    assert h[2]["op_metrics"]["files_removed"] == 0
    t.compact_deltas()
    h = _hist(root)
    assert h[3]["op"] == "compact-deltas"
    assert h[3]["op_metrics"]["files_removed"] > 0


def test_dml_and_dv_ops(spark, tmp_path):
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=4)
    t.merge(_batch(spark, 0, 200), epoch_id="e0")
    delete_where(t, F.col("k") < 10)
    h = _hist(root)
    assert h[2]["op"] == "delete"
    assert h[2]["op_metrics"]["files_removed"] > 0
    delete_where(t, F.col("k") >= 190, mode="dv")
    h = _hist(root)
    assert h[3]["op"] == "delete-dv"
    assert h[3]["op_metrics"]["dv_files_added"] > 0
    assert h[3]["op_metrics"]["files_removed"] == 0
    update_where(t, F.col("k") == 50, {"v": F.lit("patched")}, mode="dv")
    h = _hist(root)
    assert h[4]["op"] == "update-dv"


def test_metadata_only_ops_touch_nothing(spark, tmp_path):
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=4)
    t.merge(_batch(spark, 0, 50), epoch_id="e0")
    t.set_properties({"write.target-file-bytes": "1048576"})
    t.analyze(["v"])
    h = _hist(root)
    assert h[2]["op"] == "set-properties"
    assert h[3]["op"] == "analyze"
    for v in (2, 3):
        m = h[v]["op_metrics"]
        assert m["files_added"] == 0
        assert m["files_removed"] == 0
        assert m["buckets_touched"] == 0
        assert m["bytes_added"] == 0


def test_compact_and_rollback_ops(spark, tmp_path):
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=2)
    t.merge(_batch(spark, 0, 100), epoch_id="e0")
    t.merge(_batch(spark, 100, 200), epoch_id="e1")
    # explicit sort_by compacts unconditionally (the convergent
    # fragmentation rule might see nothing to do after two merges)
    t.compact(sort_by="k")
    h = _hist(root)
    assert h[3]["op"] == "compact"
    assert h[3]["op_metrics"]["files_removed"] > 0
    t.rollback(2)
    h = _hist(root)
    assert h[max(h)]["op"] == "rollback"


def test_snapshots_df_carries_op(spark, tmp_path):
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=2)
    t.merge(_batch(spark, 0, 50), epoch_id="e0")
    rows = {r.version: r for r in t.snapshots_df().collect()}
    assert rows[0].op == "create"
    assert rows[1].op == "merge"
    assert rows[1].files_added > 0
    assert rows[1].bytes_added > 0


def test_metrics_survive_manifest_spill(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_META_SPILL_BYTES", "1")
    root = str(tmp_path / "t")
    t = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=4)
    t.merge(_batch(spark, 0, 200), epoch_id="e0")
    t.merge(_batch(spark, 100, 300), epoch_id="e1")
    h = _hist(root)
    assert h[2]["op"] == "merge"
    assert h[2]["op_metrics"]["files_added"] > 0
    # rebased/spilled manifests still diff correctly against parents
    assert t.manifest.get("metadata_spill") is True
