"""Declared clustering policy: the `clustering.sort-by` /
`clustering.zorder-by` table properties (Delta liquid-clustering /
Iceberg sort-order analog). Property-driven compaction clusters the
buckets the fragmentation rule would rewrite anyway — so nightly
maintain() converges — while explicit compact(sort_by=) keeps its
rewrite-everything semantics. Schema evolution keeps the policy
coherent (drop scrubs, rename follows).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.lake.table import (
    CLUSTER_SORT_PROP, CLUSTER_ZORDER_PROP, LakeError, LakeTable,
)

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.LongType()),
    T.StructField("w", T.LongType()),
])


def _mk(spark, root, *, epochs=3, rows=600):
    t = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=2)
    for e in range(epochs):
        batch = spark.range(e * rows, (e + 1) * rows).select(
            F.col("id").alias("k"),
            (F.col("id") % 100).alias("v"),
            (F.col("id") % 7).alias("w"),
            F.lit("U").alias("op"),
            F.col("id").alias("seq"),
        )
        # MoR appends leave per-epoch delta fragments, so the
        # fragmentation rule has something to select
        t.merge(batch, epoch_id=f"e{e}", mode="mor")
    return t


def test_property_clustering_applies_on_maintain_and_converges(
    spark, tmp_path
):
    t = _mk(spark, str(tmp_path / "t"))
    t.set_properties({CLUSTER_SORT_PROP: "v"})
    before = {r["k"]: (r["v"], r["w"]) for r in t.read().collect()}
    res = t.compact(target_file_bytes=2000)
    assert res["buckets_compacted"] == 2
    # data unchanged, layout clustered: per-file v-ranges disjoint
    assert {r["k"]: (r["v"], r["w"]) for r in t.read().collect()} == before
    t.analyze(["v"])
    full = t.read().where("v >= 10 AND v <= 19").count()
    assert t.read_where("v", 10, 19).count() == full
    assert t.last_pruned_files > 0  # clustered files skip the range
    # convergence: an immediate second property-driven compact finds
    # nothing to rewrite (single clustered file per bucket)
    res2 = t.compact(target_file_bytes=2000)
    assert res2["buckets_compacted"] == 0


def test_explicit_compact_still_rewrites_everything(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), epochs=1)
    t.compact()  # down to one file per bucket
    res = t.compact(sort_by="v")  # explicit: re-cluster regardless
    assert res["buckets_compacted"] == 2


def test_property_zorder_path(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    t.set_properties({CLUSTER_ZORDER_PROP: "v,w"})
    res = t.compact(target_file_bytes=2000)
    assert res["buckets_compacted"] == 2
    assert t.read().count() == 1800


def test_cluster_on_write_sorts_merge_files(spark, tmp_path):
    import pyarrow.parquet as papq

    for mode in ("cow", "mor"):
        t = LakeTable.create(
            spark, str(tmp_path / mode), SCHEMA, key_cols=["k"],
            num_buckets=2,
        )
        t.set_properties({CLUSTER_SORT_PROP: "v"})
        batch = spark.range(2000).select(
            F.col("id").alias("k"),
            F.pmod(F.xxhash64("id"), F.lit(1000)).alias("v"),
            (F.col("id") % 7).alias("w"),
            F.lit("U").alias("op"),
            F.col("id").alias("seq"),
        )
        t.merge(batch, epoch_id="e0", mode=mode)
        files = t._files() + t._delta_files()
        assert files
        for p in files:
            vs = papq.read_table(p, columns=["v"])["v"].to_pylist()
            assert vs == sorted(vs), f"{mode}: {p} not sorted"


def test_set_properties_validates_clustering(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), epochs=1)
    with pytest.raises(LakeError, match="not in the table schema"):
        t.set_properties({CLUSTER_SORT_PROP: "nope"})
    with pytest.raises(LakeError, match="mutually exclusive"):
        t.set_properties(
            {CLUSTER_SORT_PROP: "v", CLUSTER_ZORDER_PROP: "v,w"}
        )
    t.set_properties({CLUSTER_SORT_PROP: "v"})
    with pytest.raises(LakeError, match="mutually exclusive"):
        t.set_properties({CLUSTER_ZORDER_PROP: "w"})
    # swapping works by unsetting in the same call
    t.set_properties({CLUSTER_SORT_PROP: None, CLUSTER_ZORDER_PROP: "w"})
    assert t.properties[CLUSTER_ZORDER_PROP] == "w"


def test_drop_and_rename_track_policy(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), epochs=1)
    t.set_properties({CLUSTER_ZORDER_PROP: "v,w"})
    t.drop_column("w")
    assert t.properties[CLUSTER_ZORDER_PROP] == "v"
    t.rename_column("v", "v2")
    assert t.properties[CLUSTER_ZORDER_PROP] == "v2"
    t.drop_column("v2")
    assert CLUSTER_ZORDER_PROP not in t.properties
    # stale-column leniency: a policy naming a missing column (e.g.
    # set on a branch that later diverged) must not brick maintenance
    t2 = _mk(spark, str(tmp_path / "t2"), epochs=1)
    t2.set_properties({CLUSTER_SORT_PROP: "v"})
    t2.manifest["properties"][CLUSTER_SORT_PROP] = "ghost"
    t2.compact()  # plain fragmentation compact, no error
    assert t2.read().count() == 600


def test_target_file_bytes_property(spark, tmp_path):
    """write.target-file-bytes supplies merge/compact file sizing when
    the caller passes nothing; explicit args win."""
    from haskell_dbfunctor_spark.lake.table import TARGET_FILE_BYTES_PROP

    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key_cols=["k"], num_buckets=1,
        properties={TARGET_FILE_BYTES_PROP: "4000"},
    )
    for e in range(2):
        batch = spark.range(e * 10000, (e + 1) * 10000).select(
            F.col("id").alias("k"), (F.col("id") % 100).alias("v"),
            (F.col("id") % 7).alias("w"),
            F.lit("U").alias("op"), F.col("id").alias("seq"),
        )
        t.merge(batch, epoch_id=f"e{e}", mode="mor")
    t.compact()  # no args: the 4 KB property target drives sizing
    n_small = sum(len(f) for f in t.manifest["buckets"].values())
    assert n_small > 1
    # explicit argument overrides the property
    t.compact(target_file_bytes=512 * 1024 * 1024)
    n_big = sum(len(f) for f in t.manifest["buckets"].values())
    assert n_big == 1
