"""Requantization trigger for the persisted IVF index (round 5,
VERDICT r04 item 6): q136 measures centroid drift; maintain_ivf_index
ACTS on it — probe drift of the frozen quantizer against the indexed
vectors, retrain + cell-incremental code rebuild when the threshold
trips, re-cluster, and the indexed query's recall is restored."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.types as T
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.lake.table import LakeTable
from haskell_dbfunctor_spark.pipelines.ivf_index import (
    cluster_index, create_ivf_index, create_quantizer,
    ivf_top_k_indexed, maintain_ivf_index, quantizer_drift,
    sync_ivf_index, train_quantizer,
)
from haskell_dbfunctor_spark.pipelines.similarity import _dot, _norm

EMB_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
])


def _vecs(base, start, n, spread=0.02):
    """n deterministic vectors jittered around a 4-d base point."""
    out = []
    for i in range(n):
        j = [
            spread * (((start + i) * 7 + d * 3) % 11 - 5) / 5.0
            for d in range(4)
        ]
        out.append((start + i, [float(b + x) for b, x in zip(base, j)]))
    return out


def _build(spark, tmp_path):
    rows = _vecs([1, 0, 0, 0], 0, 40) + _vecs([0, 1, 0, 0], 100, 40)
    corpus = LakeTable.create(
        spark, str(tmp_path / "corpus"), EMB_SCHEMA, key_cols=["vec_id"],
        num_buckets=4,
    )
    corpus.merge(
        spark.createDataFrame(rows, EMB_SCHEMA), op_col=None,
        order_cols=(),
    )
    qz = create_quantizer(spark, str(tmp_path / "quant"))
    train_quantizer(
        corpus.read().select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("embedding"),
        ),
        qz, n_centroids=2, refine_iters=4,
    )
    ix = create_ivf_index(spark, str(tmp_path / "ix"), num_buckets=4)
    sync_ivf_index(corpus, ix, qz)
    cluster_index(ix)
    return corpus, qz, ix


def _recall(ix, qz, query_id, k=10):
    got = {
        r["vec_id"]
        for r in ivf_top_k_indexed(ix, qz, query_id, k, nprobe=1).collect()
    }
    qv = [
        float(x)
        for x in ix.read_where_eq("vec_id", query_id)
        .select("embedding").head()["embedding"]
    ]
    qlit = F.lit(qv)
    want = {
        r["vec_id"]
        for r in ix.read()
        .where(F.col("vec_id") != query_id)
        .select(
            "vec_id",
            (
                _dot(F.col("embedding"), qlit)
                / (_norm(F.col("embedding")) * _norm(qlit))
            ).alias("c"),
        )
        .orderBy(F.col("c").desc(), F.col("vec_id").asc())
        .limit(k)
        .collect()
    }
    return len(got & want) / k


def test_no_drift_no_trigger(spark, tmp_path):
    corpus, qz, ix = _build(spark, tmp_path)
    probe = quantizer_drift(ix, qz)
    assert probe["drift"] < 0.01 and probe["cells"] == 2
    out = maintain_ivf_index(ix, qz, drift_threshold=0.02)
    assert not out["triggered"] and out["moved"] == 0


def test_drift_triggers_requantize_and_restores_recall(spark, tmp_path):
    corpus, qz, ix = _build(spark, tmp_path)
    # drift injection: a NEW cluster ON the decision boundary between
    # the two trained cells. Cell membership flips with parity (the
    # x0/x1 nudge) while the cosine NEIGHBORHOOD structure lives in
    # d2/d3 — so a query's true neighbors straddle both cells and
    # nprobe=1 recall collapses, and both cell means get pulled away
    # from the frozen centroids.
    drifted = [
        (
            200 + i,
            [
                0.7 + 0.002 * (i % 2),
                0.7 + 0.002 * ((i + 1) % 2),
                0.3 + 0.1 * ((i * 7) % 11 - 5) / 5.0,
                0.3 + 0.1 * ((i * 3 + 4) % 11 - 5) / 5.0,
            ],
        )
        for i in range(80)
    ]
    corpus.merge(
        spark.createDataFrame(drifted, EMB_SCHEMA), op_col=None,
        order_cols=(),
    )
    sync_ivf_index(corpus, ix, qz)
    probe = quantizer_drift(ix, qz)
    assert probe["drift"] > 0.02
    before = _recall(ix, qz, 200)
    assert before < 1.0  # split cluster: one probe misses neighbors

    out = maintain_ivf_index(
        ix, qz, drift_threshold=0.02, n_centroids=3, refine_iters=4
    )
    assert out["triggered"] and out["moved"] > 0
    # post-retrain: drift back under threshold, recall restored
    probe2 = quantizer_drift(ix, qz)
    assert probe2["drift"] < probe["drift"]
    after = _recall(ix, qz, 200)
    assert after >= before and after >= 0.9
    # codes consistent: every row sits in its nearest new cell
    from haskell_dbfunctor_spark.pipelines.ivf_index import (
        _collect_centroids, centroid_assign_col,
    )

    cents = _collect_centroids(qz)
    bad = (
        ix.read()
        .where(
            ~centroid_assign_col(F.col("embedding"), cents).eqNullSafe(
                F.col("cid")
            )
        )
        .count()
    )
    assert bad == 0


def test_shrink_retrain_drops_stale_centroids(spark, tmp_path):
    """ADVICE r05: train_quantizer upserts by cid (seed vec_ids, not
    dense 0..k-1) — a retrain narrower than the live quantizer used to
    leave stale old-quantizer rows live, and assignment silently mixed
    old and new centroids. maintain_ivf_index now retrains with
    replace=True (NOT MATCHED BY SOURCE DELETE leg)."""
    corpus, qz, ix = _build(spark, tmp_path)
    drifted = [
        (
            200 + i,
            [
                0.7 + 0.002 * (i % 2),
                0.7 + 0.002 * ((i + 1) % 2),
                0.3 + 0.1 * ((i * 7) % 11 - 5) / 5.0,
                0.3 + 0.1 * ((i * 3 + 4) % 11 - 5) / 5.0,
            ],
        )
        for i in range(80)
    ]
    corpus.merge(
        spark.createDataFrame(drifted, EMB_SCHEMA), op_col=None,
        order_cols=(),
    )
    sync_ivf_index(corpus, ix, qz)
    assert quantizer_drift(ix, qz)["drift"] > 0.02
    out = maintain_ivf_index(
        ix, qz, drift_threshold=0.02, n_centroids=1, refine_iters=4
    )
    assert out["triggered"]
    qz.manifest = qz._load_latest_published_manifest()
    live = {r.cid for r in qz.read().select("cid").collect()}
    assert len(live) == 1  # the old 2-cell quantizer's extra row is gone
    ix.manifest = ix._load_latest_published_manifest()
    idx_cids = {r.cid for r in ix.read().select("cid").distinct().collect()}
    assert idx_cids <= live  # every code points at a LIVE centroid


def test_default_k_keeps_trained_width(spark, tmp_path):
    """Default retrain width is the quantizer's trained width, not the
    count of cells that happen to be non-empty in the index at probe
    time (ADVICE r05 second clause)."""
    corpus, qz, ix = _build(spark, tmp_path)
    corpus.merge(
        spark.createDataFrame(
            _vecs([0.7, 0.7, 0.3, 0.3], 200, 80, spread=0.15),
            EMB_SCHEMA,
        ),
        op_col=None, order_cols=(),
    )
    sync_ivf_index(corpus, ix, qz)
    out = maintain_ivf_index(ix, qz, drift_threshold=0.02, refine_iters=4)
    assert out["triggered"]
    qz.manifest = qz._load_latest_published_manifest()
    assert qz.read().count() == 2


def test_maintenance_cli_probe_and_act(spark, tmp_path):
    from jobs.lake_maintenance import main as maint

    corpus, qz, ix = _build(spark, tmp_path)
    corpus.merge(
        spark.createDataFrame(
            _vecs([0.7, 0.7, 0.3, 0.3], 200, 80, spread=0.15),
            EMB_SCHEMA,
        ),
        op_col=None, order_cols=(),
    )
    sync_ivf_index(corpus, ix, qz)
    rc = maint([
        "--table-root", ix.root, "requantize-ivf",
        "--quantizer-root", qz.root, "--probe-only",
    ])
    assert rc == 0
    rc = maint([
        "--table-root", ix.root, "requantize-ivf",
        "--quantizer-root", qz.root, "--drift-threshold", "0.02",
        "--n-centroids", "3",
    ])
    assert rc == 0
    qz.manifest = qz._load_latest_published_manifest()
    assert qz.read().count() == 3
