"""Persisted IVF index (pipelines/ivf_index.py).

Invariants: (1) the row-wise literal-unrolled cell assignment is
bit-identical to ivf_assign's broadcast-join form; (2) with the
quantizer trained on the full corpus and the index fully synced, the
indexed query returns exactly ivf_top_k's answer; (3) the index
follows the corpus incrementally under a FROZEN quantizer — adds land
in their nearest existing cell, deletes leave it; (4) after
cluster_index, probing a cell skips files (the inverted-list read).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.types as T
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.lake.table import LakeTable
from haskell_dbfunctor_spark.pipelines.ivf_index import (
    centroid_assign_col, cluster_index, create_ivf_index, create_quantizer,
    ivf_top_k_indexed, sync_ivf_index, train_quantizer,
)
from haskell_dbfunctor_spark.pipelines.similarity import (
    ivf_assign, ivf_top_k, ivf_train,
)

EMB_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
])


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _corpus_lake(spark, tmp_path, df):
    t = LakeTable.create(
        spark, str(tmp_path / "corpus"), EMB_SCHEMA, key_cols=["vec_id"],
        num_buckets=4,
    )
    t.merge(df.select("vec_id", "embedding"), op_col=None, order_cols=())
    return t


def _build(spark, tmp_path, train_df, corpus_lake):
    qz = create_quantizer(spark, str(tmp_path / "quant"))
    train_quantizer(train_df, qz)
    ix = create_ivf_index(spark, str(tmp_path / "ix"), num_buckets=4)
    st = sync_ivf_index(corpus_lake, ix, qz)
    assert not st["skipped"]
    return qz, ix


def test_rowwise_assign_matches_ivf_assign(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cent = ivf_train(emb, 8, refine_iters=1).localCheckpoint(eager=True)
    want = {
        (r.vec_id, r.cid) for r in ivf_assign(emb, cent).collect()
    }
    from haskell_dbfunctor_spark.pipelines.ivf_index import _collect_centroids

    cents = _collect_centroids(cent.select("cid", "cv"))
    got = {
        (r.vec_id, r.cid)
        for r in emb.select(
            "vec_id", centroid_assign_col(F.col("embedding"), cents).alias("cid")
        ).collect()
    }
    assert got == want


def test_indexed_equals_one_shot(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    cl = _corpus_lake(spark, tmp_path, emb)
    qz, ix = _build(spark, tmp_path, emb, cl)
    got = [tuple(r) for r in ivf_top_k_indexed(ix, qz, 0, 10).collect()]
    want = [tuple(r) for r in ivf_top_k(emb, 0, 10).collect()]
    assert got == want and len(want) == 10


def test_incremental_frozen_quantizer(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    init = emb.where(F.col("vec_id") % 5 != 4)
    late = emb.where(F.col("vec_id") % 5 == 4)
    cl = _corpus_lake(spark, tmp_path, init)
    qz, ix = _build(spark, tmp_path, init, cl)
    n0 = ix.read().count()

    # adds: assigned to the FROZEN quantizer's nearest cell
    cl.merge(late.select("vec_id", "embedding"), op_col=None, order_cols=())
    st = sync_ivf_index(cl, ix, qz)
    assert not st["skipped"]
    cent = qz.read().select("cid", "cv").localCheckpoint(eager=True)
    want_late = {
        (r.vec_id, r.cid) for r in ivf_assign(late, cent).collect()
    }
    got_late = {
        (r.vec_id, r.cid)
        for r in ix.read().join(
            late.select("vec_id"), "vec_id", "semi"
        ).select("vec_id", "cid").collect()
    }
    assert got_late == want_late
    assert ix.read().count() == n0 + len(want_late)

    # deletes propagate
    victim = next(iter(want_late))[0]
    ch = spark.createDataFrame(
        [(victim, None, "D")],
        "vec_id long, embedding array<float>, op string",
    )
    cl.merge(ch, op_col="op", order_cols=())
    sync_ivf_index(cl, ix, qz)
    assert ix.read().where(F.col("vec_id") == victim).count() == 0

    # cursor no-op on re-sync
    assert sync_ivf_index(cl, ix, qz)["skipped"]


def test_cluster_index_prunes_cells(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    cl = _corpus_lake(spark, tmp_path, emb)
    qz, ix = _build(spark, tmp_path, emb, cl)
    st = cluster_index(ix, target_file_bytes=16 * 1024)
    assert st["analyze"]["files_with_stats"] > 0
    some_cid = ix.read().select("cid").head()[0]
    cell = ix.read_where("cid", some_cid, some_cid)
    n_cell = cell.count()
    assert n_cell > 0
    # with >1 file per bucket range-split on cid, at least one file's
    # [min, max] misses the probe
    assert ix.last_pruned_files > 0
    # pruned read is exact
    assert n_cell == ix.read().where(F.col("cid") == some_cid).count()
