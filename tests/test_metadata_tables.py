"""Iceberg-parity metadata tables: snapshots_df / files_df /
partitions_df must agree with the manifest and the parquet footers —
pure metadata reads, never a data scan."""

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


def _batch(spark, lo, hi, op="U"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
        F.lit(op).alias("op"),
        F.col("id").alias("seq"),
    )


def test_snapshots_and_files_match_manifest(spark, tmp_path):
    root = str(tmp_path / "t")
    table = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=4)
    table.merge(_batch(spark, 0, 300), epoch_id="e0")
    table.merge(_batch(spark, 150, 450), epoch_id="e1")

    snaps = table.snapshots_df().orderBy("version").collect()
    assert [r.version for r in snaps] == [0, 1, 2]
    assert snaps[-1].n_applied_epochs == 2
    assert snaps[-1].last_epoch_id == "e1"
    assert not snaps[-1].staged

    files = table.files_df().collect()
    manifest_files = {
        rel for fl in table.manifest["buckets"].values() for rel in fl
    }
    assert {r.file for r in files} == manifest_files
    assert all(r.kind == "base" and r.n_bytes > 0 for r in files)
    # footer row counts must sum to the live table row count
    assert sum(r.n_rows for r in files) == table.read().count()

    parts = table.partitions_df().collect()
    assert sum(r.n_rows for r in parts) == 450
    assert all(r.n_delta_files == 0 for r in parts)
    assert all(not r.has_partial_patches for r in parts)


def test_files_df_surfaces_deltas_and_column_stats(spark, tmp_path):
    root = str(tmp_path / "t")
    table = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=4)
    table.merge(_batch(spark, 0, 200), epoch_id="e0")
    table.analyze(["k"])
    table.merge(_batch(spark, 0, 50), epoch_id="e1", mode="mor")

    files = table.files_df()
    kinds = {r.kind for r in files.collect()}
    assert kinds == {"base", "delta"}
    analyzed = files.where(F.col("column_stats").isNotNull()).collect()
    assert analyzed, "analyze() stats must surface in files_df"
    assert all("\"k\"" in r.column_stats for r in analyzed)

    parts = table.partitions_df().collect()
    assert any(r.n_delta_files > 0 for r in parts)

    # footers=False skips footer reads but keeps bytes
    fast = table.files_df(footers=False).collect()
    assert all(r.n_rows is None and r.n_bytes > 0 for r in fast)


def test_partitions_df_flags_partial_patch_buckets(spark, tmp_path):
    root = str(tmp_path / "t")
    table = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=4)
    table.merge(_batch(spark, 0, 200), epoch_id="e0")
    patch = spark.range(0, 10).select(
        F.col("id").alias("k"),
        F.concat(F.lit("p"), F.col("id")).alias("v"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit("U").alias("op"),
        (F.col("id") + 1000).alias("seq"),
    )
    table.merge(patch, epoch_id="e1", mode="mor", partial=True)
    parts = table.partitions_df().collect()
    assert any(r.has_partial_patches for r in parts)
    flagged = [r for r in parts if r.has_partial_patches]
    assert all(r.n_delta_files > 0 for r in flagged)


def test_describe_detail(spark, tmp_path):
    root = str(tmp_path / "desc")
    t = LakeTable.create(
        spark, root, SCHEMA, ["k"], num_buckets=4, row_lineage=True,
        constraints={"k_nonneg": "k >= 0"}, properties={"owner": "ci"},
    )
    t.merge(_batch(spark, 0, 50), epoch_id="e1",
            order_cols=("ts", "seq"), drop_cols=("seq",))
    t.add_column("quality", "double", default=1.0)
    d = t.describe()
    assert d["version"] == t.version and d["key_cols"] == ["k"]
    assert d["row_lineage"] is True and d["next_row_id"] > 0
    assert d["column_defaults"]["quality"]["value"] == 1.0
    assert d["constraints"] == {"k_nonneg": "k >= 0"}
    assert d["properties"]["owner"] == "ci"
    assert d["num_data_files"] == sum(
        len(v) for v in t.manifest["buckets"].values()
    )
    assert ("quality", "double") in d["schema"]
    import json as _json

    _json.dumps(d)  # JSON-able contract
