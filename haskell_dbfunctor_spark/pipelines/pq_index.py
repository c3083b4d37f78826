"""Persisted PQ index — compressed ANN made incremental.

``pq_top_k`` (pipelines/pq.py) retrains its codebook and re-encodes
the corpus per call. At corpus scale PQ is a TABLE pair (the exact
sibling of pipelines/ivf_index.py):

- a tiny **codebook table** (sub, code, cv) trained ONCE on the
  initial corpus and frozen — late vectors are encoded against the
  existing codewords; retraining is an explicit, rare rebuild;
- an **index table** (vec_id, codes) keyed by vec_id — ``m`` BYTES of
  codeword ids per vector instead of ``dims`` floats — maintained off
  the corpus lake's change feed by :func:`lake.sync.sync_table`:
  O(changed vectors) per refresh, exactly-once via the sync cursor,
  deletes drop index rows.

Encoding is a PURE row-wise expression (the codebook is
driver-collected — O(m * n_codes) rows by construction — and unrolled
into literal structs): no shuffle, no groupBy; it runs at scan speed
inside the sync's 1:1 transform, and is pinned bit-identical to
``pq._assign_codes``'s groupBy form by tests/test_pq_index.py.

Query path (:func:`pq_top_k_indexed`): one broadcast LUT of
query-to-codeword distances, an ADC scan over the CODE column only
(the full-vector table is never touched until re-rank), a
top-``shortlist`` TakeOrderedAndProject, then an exact-cosine re-rank
that reads just ``shortlist`` vectors from the corpus via a broadcast
semi-join. At 100 TB the ADC scan reads m bytes/row where the exact
scan reads 4*dims — the 32-64x I/O reduction IS the feature.

Reference tie: replaces re-running the whole Julius chain per query
(/root/reference/src/Etl/Julius.hs re-evaluates every intermediate
RTable) with incremental maintenance of a derived table.
"""

from __future__ import annotations

from pyspark.sql import (
    Column, DataFrame, SparkSession, functions as F, types as T,
)

from ..lake.sync import sync_table
from ..lake.table import LakeTable
from .pq import _adc, _exact_rerank, _l2_6, pq_train

INDEX_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("codes", T.ArrayType(T.LongType())),
])

CODEBOOK_SCHEMA = T.StructType([
    T.StructField("sub", T.IntegerType()),
    T.StructField("code", T.LongType()),
    T.StructField("cv", T.ArrayType(T.DoubleType())),
])


def create_pq_index(
    spark: SparkSession, root: str, *, num_buckets: int = 16
) -> LakeTable:
    return LakeTable.create(
        spark, root, INDEX_SCHEMA, key_cols=["vec_id"],
        num_buckets=num_buckets,
    )


def create_codebook(
    spark: SparkSession, root: str, *, num_buckets: int = 1
) -> LakeTable:
    """The codebook lives in its own (tiny) LakeTable: versioned,
    atomically replaceable on an explicit retrain, readable by every
    executor of every sync/query job."""
    return LakeTable.create(
        spark, root, CODEBOOK_SCHEMA, key_cols=["sub", "code"],
        num_buckets=num_buckets,
    )


def train_codebook(
    train_df: DataFrame,
    codebook: LakeTable,
    *,
    m: int = 4,
    n_codes: int = 8,
    refine_iters: int = 1,
    dims: int = 64,
) -> None:
    """Train on ``train_df`` (pq_train: deterministic seeds + Lloyd
    under 6dp squared-L2) and commit the codewords. Training is the
    ONLY corpus-sized job in this module's lifecycle."""
    cb = pq_train(train_df, m, n_codes, refine_iters, dims).select(
        F.col("sub").cast("int").alias("sub"),
        "code",
        F.col("cv").cast(CODEBOOK_SCHEMA["cv"].dataType).alias("cv"),
    )
    codebook.merge(cb, op_col=None, order_cols=())


def _collect_codebook(
    codebook: LakeTable | DataFrame,
) -> list[tuple[int, int, list[float]]]:
    df = codebook.read() if isinstance(codebook, LakeTable) else codebook
    rows = df.select("sub", "code", "cv").collect()
    if not rows:
        raise ValueError("codebook table is empty — run train_codebook first")
    return sorted((int(r.sub), int(r.code), list(r.cv)) for r in rows)


def code_assign_col(
    emb_col: Column,
    cb: list[tuple[int, int, list[float]]],
    *,
    m: int = 4,
    dims: int = 64,
) -> Column:
    """The vector's PQ code array as one row-wise Column: per
    sub-space, argmin of 6dp squared-L2 over that sub-space's literal
    codewords (lowest code on ties) — bit-identical to
    ``pq._assign_codes``'s broadcast-join form (test-pinned), but with
    the codeword loop unrolled so encoding needs no join, no shuffle.
    """
    d_sub = dims // m
    per_sub = {}
    for sub, code, cv in cb:
        per_sub.setdefault(sub, []).append((code, cv))
    outs = []
    for sub in range(m):
        sv = F.transform(
            F.slice(emb_col, sub * d_sub + 1, d_sub),
            lambda x: x.cast("double"),
        )
        cands = per_sub.get(sub, [])
        if not cands:
            raise ValueError(f"codebook has no codewords for sub {sub}")
        if len(cands) == 1:
            outs.append(F.lit(cands[0][0]).cast("long"))
            continue
        best = F.least(*[
            F.struct(
                _l2_6(sv, F.lit(cv)).alias("d6"),
                F.lit(code).cast("long").alias("code"),
            )
            for code, cv in cands
        ])
        outs.append(best["code"])
    return F.array(*outs)


def sync_pq_index(
    corpus: LakeTable,
    index: LakeTable,
    codebook: LakeTable | DataFrame,
    *,
    emb_col: str = "embedding",
    mode: str = "cow",
) -> dict:
    """Advance ``index`` to ``corpus``'s current version off the change
    feed: new/updated vectors are encoded against the frozen codebook
    row-wise; deletes propagate by key. DELETE feed rows may carry
    NULL embeddings — they only need the key, so encoding is guarded.
    """
    cb = _collect_codebook(codebook)

    def tf(feed: DataFrame) -> DataFrame:
        e = F.col(emb_col)
        return feed.select(
            "vec_id",
            F.when(
                (F.col("_change_type") != "D") & e.isNotNull(),
                code_assign_col(e, cb),
            ).cast(INDEX_SCHEMA["codes"].dataType).alias("codes"),
            "_change_type",
            "_commit_version",
        )

    return sync_table(corpus, index, transform=tf, mode=mode)


def pq_top_k_indexed(
    index: LakeTable,
    codebook: LakeTable | DataFrame,
    corpus_vectors: DataFrame,
    query_vec_id: int,
    k: int = 10,
    *,
    shortlist: int = 50,
    dims: int = 64,
) -> DataFrame:
    """Top-k by exact cosine over the ADC shortlist, where the
    shortlist is computed ENTIRELY from the compressed index: LUT =
    the query's 6dp squared-L2 to every codeword (m * n_codes rows,
    broadcast), ADC = Σ_sub LUT[sub, codes[sub]] over ``index``'s code
    column, re-rank touches only ``shortlist`` rows of
    ``corpus_vectors`` (broadcast semi-join). Output contract matches
    ``pq_top_k``: (vec_id, cos_sim[4dp]), cos desc / vec_id asc,
    query excluded."""
    spark = index.spark
    cb = _collect_codebook(codebook)
    m = max(s for s, _, _ in cb) + 1
    d_sub = dims // m
    qrow = (
        corpus_vectors.where(F.col("vec_id") == query_vec_id)
        .select("embedding").head()
    )
    if qrow is None:
        raise ValueError(f"query vec_id {query_vec_id} not in corpus")
    qv = [float(x) for x in qrow["embedding"]]
    qsv = spark.createDataFrame(
        [(s, qv[s * d_sub:(s + 1) * d_sub]) for s in range(m)],
        "sub int, qsv array<double>",
    )
    cb_df = spark.createDataFrame(cb, CODEBOOK_SCHEMA)
    lut = cb_df.join(qsv, "sub").select(
        "sub", "code", _l2_6(F.col("cv"), F.col("qsv")).alias("d")
    )
    enc = index.read().select("vec_id", "codes")
    cand = (
        _adc(enc, lut, query_vec_id)
        .orderBy(F.col("adc").asc(), F.col("vec_id").asc())
        .limit(shortlist)
        .select("vec_id")
    )
    return _exact_rerank(cand, corpus_vectors, query_vec_id, k)


# --------------------------------------------------------------- IVF-PQ
# The combined persisted layout — FAISS IVFx,PQy at rest: one index
# table (vec_id, cid, codes) maintained off the corpus CDF, clustered
# by cid (ivf_index.cluster_index), so a query reads ONLY the probed
# cells' files and ONLY the m-byte code column from them. The coarse
# quantizer (ivf_index) and the PQ codebook (above) are both frozen
# tiny tables; neither retrains on sync.

IVFPQ_INDEX_SCHEMA = T.StructType([
    T.StructField("vec_id", T.LongType()),
    T.StructField("cid", T.LongType()),
    T.StructField("codes", T.ArrayType(T.LongType())),
])


def create_ivfpq_index(
    spark: SparkSession, root: str, *, num_buckets: int = 16
) -> LakeTable:
    return LakeTable.create(
        spark, root, IVFPQ_INDEX_SCHEMA, key_cols=["vec_id"],
        num_buckets=num_buckets,
    )


def sync_ivfpq_index(
    corpus: LakeTable,
    index: LakeTable,
    quantizer: LakeTable | DataFrame,
    codebook: LakeTable | DataFrame,
    *,
    emb_col: str = "embedding",
    mode: str = "cow",
) -> dict:
    """Advance the combined index off the corpus change feed: each
    new/updated vector gets its coarse cell (row-wise literal argmax,
    ``ivf_index.centroid_assign_col``) AND its PQ codes (row-wise
    literal argmin, ``code_assign_col``) in ONE 1:1 projection —
    O(changed vectors), no shuffle beyond the merge itself."""
    from .ivf_index import _collect_centroids, centroid_assign_col

    cents = _collect_centroids(quantizer)
    cb = _collect_codebook(codebook)

    def tf(feed: DataFrame) -> DataFrame:
        e = F.col(emb_col)
        live = (F.col("_change_type") != "D") & e.isNotNull()
        return feed.select(
            "vec_id",
            F.when(live, centroid_assign_col(e, cents)).alias("cid"),
            F.when(live, code_assign_col(e, cb))
            .cast(IVFPQ_INDEX_SCHEMA["codes"].dataType).alias("codes"),
            "_change_type",
            "_commit_version",
        )

    return sync_table(corpus, index, transform=tf, mode=mode)


def ivfpq_top_k_indexed(
    index: LakeTable,
    quantizer: LakeTable | DataFrame,
    codebook: LakeTable | DataFrame,
    corpus_vectors: DataFrame,
    query_vec_id: int,
    k: int = 10,
    *,
    nprobe: int = 2,
    shortlist: int = 50,
    dims: int = 64,
) -> DataFrame:
    """Serve top-k from the combined index: probe the ``nprobe``
    nearest cells (tiny quantizer scan), read ONLY those cells from
    the index (``read_where`` — file-level stats pruning after
    ``ivf_index.cluster_index`` has clustered it by cid), ADC-rank
    their codes against one broadcast LUT, exact-cosine re-rank the
    shortlist from the full-vector table. Per-query I/O =
    (nprobe/n_centroids) x corpus in CODE bytes + ``shortlist``
    vectors — the 100 TB serving shape."""
    from .ivf_index import _collect_centroids
    from .similarity import _cos6

    spark = index.spark
    cents = _collect_centroids(quantizer)
    cb = _collect_codebook(codebook)
    m = max(s for s, _, _ in cb) + 1
    d_sub = dims // m
    qrow = (
        corpus_vectors.where(F.col("vec_id") == query_vec_id)
        .select("embedding").head()
    )
    if qrow is None:
        raise ValueError(f"query vec_id {query_vec_id} not in corpus")
    qv = [float(x) for x in qrow["embedding"]]
    cent_df = spark.createDataFrame(
        [(cid, cv) for cid, cv, _ in cents], "cid long, cv array<double>"
    )
    probes = [
        r["cid"]
        for r in cent_df.select(
            "cid", _cos6(F.col("cv"), F.lit(qv)).alias("c6")
        )
        .orderBy(F.col("c6").desc(), F.col("cid").asc())
        .limit(nprobe)
        .collect()
    ]
    qsv = spark.createDataFrame(
        [(s, qv[s * d_sub:(s + 1) * d_sub]) for s in range(m)],
        "sub int, qsv array<double>",
    )
    cb_df = spark.createDataFrame(cb, CODEBOOK_SCHEMA)
    lut = cb_df.join(qsv, "sub").select(
        "sub", "code", _l2_6(F.col("cv"), F.col("qsv")).alias("d")
    )
    cells = None
    for c in probes:
        cell = index.read_where("cid", c, c).select("vec_id", "codes")
        cells = cell if cells is None else cells.unionByName(cell)
    cand = (
        _adc(cells, lut, query_vec_id)
        .orderBy(F.col("adc").asc(), F.col("vec_id").asc())
        .limit(shortlist)
        .select("vec_id")
    )
    return _exact_rerank(cand, corpus_vectors, query_vec_id, k)
