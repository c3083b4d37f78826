"""Persisted IVF-Flat ANN index — similarity search made incremental.

``ivf_top_k`` (pipelines/similarity.py) retrains its coarse quantizer
and reassigns the whole corpus on every call. At corpus scale the IVF
structure is a TABLE pair, not a subexpression:

- a tiny **quantizer table** (cid, cv) trained ONCE from the initial
  corpus and then frozen — the classic IVF contract: late-arriving
  vectors are assigned to existing cells; retraining is an explicit,
  rare rebuild, never implicit per query;
- an **index table** (vec_id, cid, embedding) keyed by vec_id and
  maintained off the corpus lake's change feed by
  :func:`lake.sync.sync_table` — O(changed vectors) per refresh,
  exactly-once via the sync cursor, deletes drop index rows.

Cell assignment is a PURE row-wise expression (the centroids are
driver-collected — they are O(n_centroids) rows by construction — and
inlined as array literals): no shuffle, no groupBy; assignment runs at
scan speed inside the sync's 1:1 transform, mirroring how
``dedup_index.signature_cols`` treats MinHash signatures.

Read path: ``compact(sort_by="cid")`` + ``analyze(["cid"])`` cluster
the index files by cell and record per-file [min, max] bounds, so
:func:`ivf_top_k_indexed` reads each probed cell via
``read_where("cid", c, c)`` — file-level pruning on top of bucket
layout; the per-query cost is nprobe cells, never the corpus. This is
the physical realization of the scale posture ``ivf_top_k``'s
docstring promises ("assignment computed once at ingest, corpus
stored partitioned by cid").

Reference tie: replaces re-running the whole Julius chain per query
(/root/reference/src/Etl/Julius.hs re-evaluates every intermediate
RTable) with incremental maintenance of a derived table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F, types as T

from ..lake.sync import sync_table
from ..lake.table import LakeTable
from .similarity import _cos6, _dot, _norm, ivf_train

INDEX_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("cid", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
])

CENT_SCHEMA = T.StructType([
    T.StructField("cid", T.LongType()),
    T.StructField("cv", T.ArrayType(T.DoubleType())),
])


def create_ivf_index(
    spark: SparkSession, root: str, *, num_buckets: int = 16
) -> LakeTable:
    return LakeTable.create(
        spark, root, INDEX_SCHEMA, key_cols=["vec_id"], num_buckets=num_buckets
    )


def create_quantizer(
    spark: SparkSession, root: str, *, num_buckets: int = 1
) -> LakeTable:
    """The quantizer lives in its own (tiny) LakeTable: versioned,
    atomically replaceable on an explicit retrain, readable by every
    executor of every sync/query job."""
    return LakeTable.create(
        spark, root, CENT_SCHEMA, key_cols=["cid"], num_buckets=num_buckets
    )


def train_quantizer(
    train_df: DataFrame,
    quantizer: LakeTable,
    *,
    n_centroids: int = 8,
    refine_iters: int = 1,
) -> None:
    """Train on ``train_df`` (ivf_train: deterministic seeds + Lloyd
    steps, 6dp-rounded) and commit the centroids. Training is the ONLY
    corpus-sized job in this module's lifecycle; everything after is
    O(changes) or O(cells probed)."""
    cent = ivf_train(train_df, n_centroids, refine_iters).select(
        "cid", F.col("cv").cast(CENT_SCHEMA["cv"].dataType).alias("cv")
    )
    quantizer.merge(cent, op_col=None, order_cols=())


def _collect_centroids(quantizer: LakeTable | DataFrame) -> list[tuple]:
    """[(cid, cv, cn)] with the norm computed by the SAME Spark fold
    the one-shot path uses — keeps every downstream 6dp rounding on
    the same side as ``ivf_assign`` and the SQL oracle."""
    df = quantizer.read() if isinstance(quantizer, LakeTable) else quantizer
    rows = df.select("cid", "cv", _norm(F.col("cv")).alias("cn")).collect()
    if not rows:
        raise ValueError("quantizer table is empty — run train_quantizer first")
    return [(r.cid, list(r.cv), float(r.cn)) for r in rows]


def centroid_assign_col(emb_col: Column, cents: list[tuple]) -> Column:
    """Nearest-cell cid as a row-wise Column: argmax of 6dp cosine,
    lowest cid on ties — bit-identical to ``ivf_assign``'s groupBy
    form (test-pinned), but with the centroid loop unrolled into
    literals so assignment needs no join and no shuffle.

    The embedding norm is computed ONCE and carried through the
    per-centroid structs (not re-derived per cell): n_centroids
    dot products per row, not 2x that."""
    nrm = _norm(emb_col)
    best = F.greatest(*[
        F.struct(
            F.round(
                _dot(emb_col, F.lit(cv)) / (nrm * F.lit(cn)), 6
            ).alias("c6"),
            F.lit(-cid).alias("nc"),
            F.lit(cid).alias("cid"),
        )
        for cid, cv, cn in cents
    ]) if len(cents) > 1 else F.struct(
        F.lit(0.0).alias("c6"),
        F.lit(-cents[0][0]).alias("nc"),
        F.lit(cents[0][0]).alias("cid"),
    )
    return best["cid"]


def sync_ivf_index(
    corpus: LakeTable,
    index: LakeTable,
    quantizer: LakeTable | DataFrame,
    *,
    emb_col: str = "embedding",
    mode: str = "cow",
) -> dict:
    """Advance ``index`` to ``corpus``'s current version off the change
    feed: new/updated vectors are assigned to the frozen quantizer's
    nearest cell row-wise; deletes propagate by key (a removed vector
    leaves its cell). DELETE feed rows may carry NULL embeddings —
    they only need the key, so assignment is guarded."""
    cents = _collect_centroids(quantizer)

    def tf(feed: DataFrame) -> DataFrame:
        e = F.col(emb_col)
        return feed.select(
            "vec_id",
            F.when(
                (F.col("_change_type") != "D") & e.isNotNull(),
                centroid_assign_col(e, cents),
            ).alias("cid"),
            e.cast(INDEX_SCHEMA["embedding"].dataType).alias("embedding"),
            "_change_type",
            "_commit_version",
        )

    return sync_table(corpus, index, transform=tf, mode=mode)


def cluster_index(index: LakeTable, **compact_opts) -> dict:
    """Cluster the index files by cell and refresh the stats catalog:
    after this, ``read_where("cid", c, c)`` skips every file whose
    [min, max] cid range misses the probe — the IVF 'inverted list'
    realized as stats-pruned parquet. Run after (batches of) syncs;
    files written since simply aren't pruned until the next pass.
    ``compact_opts`` pass through (e.g. ``target_file_bytes`` governs
    how many range-split files — and so how fine the pruning — each
    bucket gets)."""
    st = index.compact(sort_by="cid", **compact_opts)
    st_an = index.analyze(["cid"])
    return {"compact": st, "analyze": st_an}


def ivf_top_k_indexed(
    index: LakeTable,
    quantizer: LakeTable | DataFrame,
    query_vec_id: int,
    k: int = 10,
    *,
    nprobe: int = 2,
) -> DataFrame:
    """Top-k by exact cosine within the ``nprobe`` cells nearest the
    query, reading ONLY those cells from the index (stats-pruned; see
    ``cluster_index``). Output contract matches ``ivf_top_k``:
    (vec_id, cos_sim[round 4]), cos desc / vec_id asc, query excluded.
    """
    spark = index.spark
    cents = _collect_centroids(quantizer)
    qrow = (
        index.read_where_eq("vec_id", query_vec_id)
        .select("embedding").head()
    )
    if qrow is None:
        raise ValueError(f"query vec_id {query_vec_id} not in index")
    qv = [float(x) for x in qrow["embedding"]]

    # probe selection over the (tiny) centroid set — same _cos6 fold
    # as the one-shot path so the 6dp ranking is engine-identical
    cent_df = spark.createDataFrame(
        [(cid, cv) for cid, cv, _ in cents], CENT_SCHEMA
    )
    probes = [
        r.cid
        for r in cent_df.select(
            "cid", _cos6(F.col("cv"), F.lit(qv)).alias("c6")
        )
        .orderBy(F.col("c6").desc(), F.col("cid").asc())
        .limit(nprobe)
        .collect()
    ]

    cand = None
    for c in probes:
        cell = index.read_where("cid", c, c)
        cand = cell if cand is None else cand.unionByName(cell)
    qlit = F.lit(qv)
    sims = (
        cand.where(F.col("vec_id") != query_vec_id)
        .select(
            "vec_id",
            (
                _dot(F.col("embedding"), qlit)
                / (_norm(F.col("embedding")) * _norm(qlit))
            ).alias("cos_sim_raw"),
        )
    )
    return (
        sims.select("vec_id", F.round("cos_sim_raw", 4).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )
