"""Product quantization (PQ) ANN — the compressed-storage similarity
path (Jégou et al., "Product Quantization for Nearest Neighbor
Search", TPAMI 2011).

The 100 TB posture: a 64-dim float embedding is 256 bytes; its PQ code
(``m`` sub-space codeword ids) is ``m`` bytes — a 32-64x smaller scan.
At scale the codebook is trained ONCE at ingest (tiny: ``m *
n_codes`` rows), codes are stored as a column next to the vectors
(exactly like the persisted IVF assignments of
``pipelines/ivf_index.py``), and a query scans ONLY the code column:
one broadcast of an ``m * n_codes``-entry lookup table (LUT of
query-to-codeword distances), a map-side sum of ``m`` LUT hits per
row (asymmetric distance computation, ADC), a top-``shortlist``
TakeOrderedAndProject, then an exact-cosine re-rank that touches just
``shortlist`` full vectors. No full-vector math ever runs over the
corpus at query time.

Determinism/oracle contract (shared with the IVF family,
``similarity.py``): seeds are the ``n_codes`` smallest vec_ids'
sub-vectors rounded to 6dp; Lloyd assignment uses squared-L2 rounded
to 6dp with lowest-code tie-break; refined codewords are 6dp-rounded
element means. Every comparison an external engine re-runs lands on
the same side of the boundary, so the DuckDB oracle (q158/q159)
reproduces codes and rankings bit-for-bit.

Composition: ``ivfpq_top_k`` is IVF-PQ — the coarse quantizer
(``similarity.ivf_train``) prunes to ``nprobe`` cells, ADC ranks
within them. That is the standard billion-scale configuration
(FAISS ``IVFx,PQy``): query cost = nprobe/n_centroids of the corpus
in CODE bytes, not vector bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .similarity import _dot, _norm, ivf_assign, ivf_train


def _l2_6(a, b):
    """Squared L2 distance rounded to 6dp — the cross-engine
    determinism boundary (same rule as ``similarity._cos6``)."""
    return F.round(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        6,
    )


def subvectors(embeddings: DataFrame, m: int = 4, dims: int = 64) -> DataFrame:
    """(vec_id, sub, sv: array<double>): the vector split into ``m``
    contiguous sub-spaces of ``dims // m`` elements. One
    explode(array(...)) — NEVER a unionAll of m slices, which would
    compute the scan subtree m times (the documented double-compute
    gotcha)."""
    assert dims % m == 0, "dims must divide evenly into m sub-spaces"
    d_sub = dims // m
    parts = [
        F.struct(
            F.lit(s).alias("sub"),
            F.transform(
                F.slice(F.col("embedding"), s * d_sub + 1, d_sub),
                lambda x: x.cast("double"),
            ).alias("sv"),
        )
        for s in range(m)
    ]
    return embeddings.select(
        "vec_id", F.explode(F.array(*parts)).alias("p")
    ).select("vec_id", F.col("p.sub").alias("sub"), F.col("p.sv").alias("sv"))


def _assign_codes(sv: DataFrame, codebook: DataFrame) -> DataFrame:
    """(vec_id, sub, code): nearest codeword per sub-vector by 6dp
    squared-L2, lowest code on ties. Broadcast hash join — the codebook
    is O(m * n_codes) rows; the sub-vector side never shuffles for the
    join (one hash-agg shuffle for the per-key argmin)."""
    scored = sv.join(F.broadcast(codebook), "sub").select(
        "vec_id", "sub", "code", _l2_6(F.col("sv"), F.col("cv")).alias("d6")
    )
    return scored.groupBy("vec_id", "sub").agg(
        F.min_by("code", F.struct(F.col("d6"), F.col("code"))).alias("code")
    )


def pq_train(
    embeddings: DataFrame,
    m: int = 4,
    n_codes: int = 8,
    refine_iters: int = 1,
    dims: int = 64,
) -> DataFrame:
    """PQ codebook: per sub-space, ``n_codes`` codewords — seeds = the
    ``n_codes`` smallest vec_ids' sub-vectors (code id = seed vec_id,
    the IVF convention), refined by ``refine_iters`` distributed Lloyd
    steps under squared-L2. Returns (sub, code, cv: array<double>).

    Every step is an oracle-reproducible DataFrame plan: assignment is
    a broadcast join + per-(vec, sub) argmin on 6dp distances; the mean
    is a posexplode → (sub, code, dim) hash agg → array_sort rebuild.
    Linear in the corpus, map-side combinable, no driver-side vectors.
    """
    sv = subvectors(embeddings, m, dims)
    seeds = embeddings.orderBy("vec_id").limit(n_codes).select("vec_id")
    cb = sv.join(F.broadcast(seeds), "vec_id").select(
        "sub",
        F.col("vec_id").alias("code"),
        F.transform(F.col("sv"), lambda x: F.round(x, 6)).alias("cv"),
    )
    for _ in range(refine_iters):
        assigned = _assign_codes(sv, cb)
        elem = (
            assigned.join(sv, ["vec_id", "sub"])
            .select("sub", "code", F.posexplode("sv").alias("dim", "x"))
            .groupBy("sub", "code", "dim")
            .agg(F.round(F.avg("x"), 6).alias("m"))
        )
        cb = elem.groupBy("sub", "code").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "m"))),
                lambda s: s["m"],
            ).alias("cv")
        )
    return cb


def pq_encode(
    embeddings: DataFrame, codebook: DataFrame, m: int = 4, dims: int = 64
) -> DataFrame:
    """(vec_id, codes: array<bigint> ordered by sub) — the compact
    stored form: ``m`` codeword ids replace ``dims`` floats. At 100 TB
    this column is written at ingest next to the key (the vector column
    itself can live in cold storage); ADC queries scan ONLY this."""
    assigned = _assign_codes(subvectors(embeddings, m, dims), codebook)
    return assigned.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "code"))),
            lambda s: s["code"],
        ).alias("codes")
    )


def _adc(
    enc: DataFrame, lut: DataFrame, query_vec_id: int
) -> DataFrame:
    """(vec_id, adc): asymmetric distance = Σ_sub LUT[sub, code]. The
    LUT is m*n_codes rows (broadcast); the encoded side explodes to m
    rows per vector and hash-aggregates back — all map-side until the
    final per-key sum."""
    return (
        enc.where(F.col("vec_id") != query_vec_id)
        .select("vec_id", F.posexplode("codes").alias("sub", "code"))
        .join(F.broadcast(lut), ["sub", "code"])
        .groupBy("vec_id")
        .agg(F.round(F.sum("d"), 6).alias("adc"))
    )


def _exact_rerank(
    cand: DataFrame, embeddings: DataFrame, query_vec_id: int, k: int
) -> DataFrame:
    qv = embeddings.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv")
    )
    sims = (
        cand.join(embeddings, "vec_id")
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            (
                _dot(F.col("embedding"), F.col("qv"))
                / (_norm(F.col("embedding")) * _norm(F.col("qv")))
            ).alias("cos_sim_raw"),
        )
    )
    return (
        sims.select("vec_id", F.round("cos_sim_raw", 4).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def pq_lut(
    embeddings: DataFrame,
    codebook: DataFrame,
    query_vec_id: int,
    m: int = 4,
    dims: int = 64,
) -> DataFrame:
    """(sub, code, d): the query's distance to every codeword —
    m*n_codes rows computed once per query, then broadcast."""
    qsv = subvectors(
        embeddings.where(F.col("vec_id") == query_vec_id), m, dims
    ).select("sub", F.col("sv").alias("qsv"))
    return codebook.join(qsv, "sub").select(
        "sub", "code", _l2_6(F.col("cv"), F.col("qsv")).alias("d")
    )


def pq_top_k(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    *,
    m: int = 4,
    n_codes: int = 8,
    shortlist: int = 50,
    refine_iters: int = 1,
    dims: int = 64,
) -> DataFrame:
    """PQ ANN: train → encode → ADC shortlist → exact-cosine re-rank.

    The shortlist is ranked by ADC ascending (vec_id tie-break) —
    a TakeOrderedAndProject over the code column only; exact cosine
    then touches ``shortlist`` full vectors. Recall is governed by
    ``shortlist`` and code granularity (m, n_codes) — see
    tests/test_pq_ann.py for the pinned recall on the test corpus.
    """
    # materialize the trained codebook: referenced by BOTH the LUT and
    # the encoding — leaving it lazy re-runs Lloyd training once per
    # reference in the physical plan (the q93 lazy-quantizer trap)
    cb = pq_train(embeddings, m, n_codes, refine_iters, dims).localCheckpoint(
        eager=True
    )
    enc = pq_encode(embeddings, cb, m, dims)
    lut = pq_lut(embeddings, cb, query_vec_id, m, dims)
    cand = (
        _adc(enc, lut, query_vec_id)
        .orderBy(F.col("adc").asc(), F.col("vec_id").asc())
        .limit(shortlist)
        .select("vec_id")
    )
    return _exact_rerank(cand, embeddings, query_vec_id, k)


def ivfpq_top_k(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    *,
    n_centroids: int = 8,
    nprobe: int = 2,
    m: int = 4,
    n_codes: int = 8,
    shortlist: int = 50,
    refine_iters: int = 1,
    dims: int = 64,
) -> DataFrame:
    """IVF-PQ: the billion-scale composition. The IVF coarse quantizer
    (``similarity.ivf_train``, cosine cells) prunes the corpus to
    ``nprobe`` cells; PQ ADC ranks the survivors from codes alone;
    exact cosine re-ranks the shortlist. Query cost =
    (nprobe / n_centroids) x corpus in CODE bytes + ``shortlist`` full
    vectors — at 100 TB with cid-partitioned storage (the
    ``ivf_index.cluster_index`` layout) the scan reads nprobe
    partitions of a 1-byte-per-sub column."""
    from .similarity import _cos6

    cent = ivf_train(embeddings, n_centroids, refine_iters).localCheckpoint(
        eager=True
    )
    assigned = ivf_assign(embeddings, cent)
    qv = embeddings.where(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("qv")
    )
    probes = (
        cent.crossJoin(F.broadcast(qv))
        .select("cid", _cos6(F.col("cv"), F.col("qv")).alias("c6"))
        .orderBy(F.col("c6").desc(), F.col("cid").asc())
        .limit(nprobe)
        .select("cid")
    )
    cb = pq_train(embeddings, m, n_codes, refine_iters, dims).localCheckpoint(
        eager=True
    )
    enc = pq_encode(embeddings, cb, m, dims).join(assigned, "vec_id").join(
        F.broadcast(probes), "cid"
    )
    lut = pq_lut(embeddings, cb, query_vec_id, m, dims)
    cand = (
        _adc(enc, lut, query_vec_id)
        .orderBy(F.col("adc").asc(), F.col("vec_id").asc())
        .limit(shortlist)
        .select("vec_id")
    )
    return _exact_rerank(cand, embeddings, query_vec_id, k)
