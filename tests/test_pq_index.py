"""Persisted PQ index (pipelines/pq_index.py): frozen-codebook
encoding pinned bit-identical to the groupBy form, CDF-incremental
maintenance (inserts/updates/deletes), and the indexed query's
equivalence to the one-shot pq_top_k under the same codebook."""
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.lake.table import LakeTable
from haskell_dbfunctor_spark.pipelines.pq import (
    _assign_codes,
    pq_encode,
    pq_top_k,
    pq_train,
    subvectors,
)
from haskell_dbfunctor_spark.pipelines.pq_index import (
    _collect_codebook,
    code_assign_col,
    create_codebook,
    create_pq_index,
    pq_top_k_indexed,
    sync_pq_index,
    train_codebook,
)

import pyspark.sql.types as T

CORPUS_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
])


@pytest.fixture()
def root(tmp_path):
    d = str(tmp_path / f"pqix_{uuid.uuid4().hex[:6]}")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _emb(spark, sf_dir, where=None):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    return df.where(where) if where is not None else df


def test_literal_encoding_matches_groupby_form(spark, sf_dir):
    emb = _emb(spark, sf_dir).where(F.col("vec_id") < 150)
    cb_df = pq_train(emb, m=4, n_codes=8).localCheckpoint(eager=True)
    via_join = {
        (r["vec_id"], r["sub"]): r["code"]
        for r in _assign_codes(subvectors(emb, 4, 64), cb_df).collect()
    }
    cb = sorted(
        (int(r["sub"]), int(r["code"]), list(r["cv"]))
        for r in cb_df.collect()
    )
    via_literal = {
        r["vec_id"]: r["codes"]
        for r in emb.select(
            "vec_id", code_assign_col(F.col("embedding"), cb).alias("codes")
        ).collect()
    }
    for (vid, sub), code in via_join.items():
        assert via_literal[vid][sub] == code, (vid, sub)


def test_sync_and_indexed_query_match_one_shot(spark, sf_dir, root):
    emb = _emb(spark, sf_dir).where(F.col("vec_id") < 300)
    corpus = LakeTable.create(
        spark, f"{root}/corpus", CORPUS_SCHEMA, ["vec_id"], num_buckets=4
    )
    corpus.merge(emb, op_col=None, order_cols=())
    cbt = create_codebook(spark, f"{root}/cb")
    train_codebook(emb, cbt)
    ix = create_pq_index(spark, f"{root}/ix", num_buckets=4)
    st = sync_pq_index(corpus, ix, cbt)
    assert not st.get("skipped")
    # index rows == corpus rows, codes match pq_encode under the
    # SAME codebook
    cb_df = cbt.read().select(
        F.col("sub").cast("long").alias("sub"), "code", "cv"
    )
    expected = {
        r["vec_id"]: r["codes"] for r in pq_encode(emb, cb_df).collect()
    }
    got = {r["vec_id"]: r["codes"] for r in ix.read().collect()}
    assert got == expected
    # the full train+encode one-shot and the indexed path return the
    # SAME top-k (same codebook: train set == corpus)
    one_shot = [
        (r["vec_id"], r["cos_sim"]) for r in pq_top_k(emb, 0, 10).collect()
    ]
    indexed = [
        (r["vec_id"], r["cos_sim"])
        for r in pq_top_k_indexed(ix, cbt, emb, 0, 10).collect()
    ]
    assert indexed == one_shot
    # a re-sync with no new corpus commits is a no-op
    assert sync_pq_index(corpus, ix, cbt)["skipped"]


def test_incremental_sync_inserts_updates_deletes(spark, sf_dir, root):
    init = _emb(spark, sf_dir).where(
        (F.col("vec_id") < 200) & (F.col("vec_id") % 5 != 4)
    )
    late = _emb(spark, sf_dir).where(
        (F.col("vec_id") < 200) & (F.col("vec_id") % 5 == 4)
    )
    corpus = LakeTable.create(
        spark, f"{root}/corpus", CORPUS_SCHEMA, ["vec_id"], num_buckets=4
    )
    corpus.merge(init, op_col=None, order_cols=())
    cbt = create_codebook(spark, f"{root}/cb")
    train_codebook(init, cbt)  # frozen BEFORE the late batch
    ix = create_pq_index(spark, f"{root}/ix", num_buckets=4)
    sync_pq_index(corpus, ix, cbt)
    n0 = ix.read().count()
    # late inserts arrive through the CDF — encoded against the
    # frozen codebook, no retrain
    corpus.merge(late, op_col=None, order_cols=())
    sync_pq_index(corpus, ix, cbt)
    assert ix.read().count() == n0 + late.count()
    # deletes drop index rows by key
    corpus.merge(
        late.limit(7).withColumn("op", F.lit("D")), order_cols=()
    )
    sync_pq_index(corpus, ix, cbt)
    assert ix.read().count() == n0 + late.count() - 7
    # index state == encoding of the corpus's CURRENT state under the
    # frozen codebook (the convergence invariant)
    cb = _collect_codebook(cbt)
    cur = corpus.read()
    expected = {
        r["vec_id"]: list(r["codes"])
        for r in cur.select(
            "vec_id", code_assign_col(F.col("embedding"), cb).alias("codes")
        ).collect()
    }
    got = {r["vec_id"]: list(r["codes"]) for r in ix.read().collect()}
    assert got == expected


def test_ivfpq_index_matches_one_shot_and_prunes(spark, sf_dir, root):
    """The combined (vec_id, cid, codes) index serves EXACTLY the
    one-shot ivfpq_top_k ranking when both train on the same corpus;
    after cluster_index, the probed-cell read plans scan only
    cid-matching files (stats pruning)."""
    from haskell_dbfunctor_spark.pipelines.ivf_index import (
        cluster_index, create_quantizer, train_quantizer,
    )
    from haskell_dbfunctor_spark.pipelines.pq import ivfpq_top_k
    from haskell_dbfunctor_spark.pipelines.pq_index import (
        create_ivfpq_index, ivfpq_top_k_indexed, sync_ivfpq_index,
    )

    emb = _emb(spark, sf_dir).where(F.col("vec_id") < 300)
    corpus = LakeTable.create(
        spark, f"{root}/corpus", CORPUS_SCHEMA, ["vec_id"], num_buckets=4
    )
    corpus.merge(emb, op_col=None, order_cols=())
    qz = create_quantizer(spark, f"{root}/qz")
    train_quantizer(emb, qz)
    cbt = create_codebook(spark, f"{root}/cb")
    train_codebook(emb, cbt)
    ix = create_ivfpq_index(spark, f"{root}/ix", num_buckets=4)
    sync_ivfpq_index(corpus, ix, qz, cbt)
    cluster_index(ix, target_file_bytes=64 * 1024)
    got = [
        (r["vec_id"], r["cos_sim"])
        for r in ivfpq_top_k_indexed(ix, qz, cbt, emb, 0, 10).collect()
    ]
    exp = [
        (r["vec_id"], r["cos_sim"])
        for r in ivfpq_top_k(emb, 0, 10).collect()
    ]
    assert got == exp
    # incremental: deletes drop combined rows too
    corpus.merge(
        emb.where(F.col("vec_id") >= 290).withColumn("op", F.lit("D")),
        order_cols=(),
    )
    sync_ivfpq_index(corpus, ix, qz, cbt)
    assert ix.read().where(F.col("vec_id") >= 290).count() == 0
    assert ix.read().count() == corpus.read().count()
