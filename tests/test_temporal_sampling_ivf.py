"""Semantics tests for the temporal operators (asof_join, sessionize),
deterministic hash sampling, the SimHash-Hamming near-dup path, and
IVF-Flat ANN — the pieces behind q49-q53. Oracle parity is covered by
test_entry_oracle.py; these pin the operator contracts directly.
"""

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from haskell_dbfunctor_spark.operators import asof_join, sessionize
from haskell_dbfunctor_spark.pipelines.dedup_text import (
    near_dup_counts, simhash16, simhash64, simhash_near_dup_counts,
)
from haskell_dbfunctor_spark.pipelines.sampling import (
    hash_sample, stratified_hash_sample, threshold_hex,
    train_test_split_col,
)
from haskell_dbfunctor_spark.pipelines.similarity import (
    cosine_top_k, ivf_assign, ivf_top_k, ivf_train,
)


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


# --------------------------------------------------------------- asof_join

@pytest.fixture(scope="module")
def asof_frames(spark):
    left = spark.createDataFrame(
        [
            Row(k=1, ts=_ts(5), lv="a"),
            Row(k=1, ts=_ts(10), lv="b"),
            Row(k=1, ts=_ts(1), lv="early"),   # before any right row
            Row(k=2, ts=_ts(7), lv="c"),       # key with no right rows
            Row(k=3, ts=_ts(4), lv="exact"),   # ts == right ts
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k=1, ts=_ts(2), rv=20),
            Row(k=1, ts=_ts(6), rv=60),
            Row(k=3, ts=_ts(4), rv=40),
        ]
    )
    return left, right


def test_asof_inclusive(asof_frames):
    left, right = asof_frames
    out = {
        (r["k"], r["lv"]): r["rv"]
        for r in asof_join(left, right, "k", "ts").collect()
    }
    assert out[(1, "a")] == 20       # latest right at ts<=5 is ts=2
    assert out[(1, "b")] == 60       # ts=6 row now visible
    assert out[(1, "early")] is None  # nothing before ts=1
    assert out[(2, "c")] is None     # no right rows for key
    assert out[(3, "exact")] == 40   # inclusive: equal ts matches


def test_asof_exclusive_and_suffix(asof_frames):
    left, right = asof_frames
    out = {
        (r["k"], r["lv"]): r["rv"]
        for r in asof_join(
            left, right, "k", "ts", allow_exact_match=False
        ).collect()
    }
    assert out[(3, "exact")] is None  # strict <: equal ts excluded
    assert out[(1, "b")] == 60

    # payload name colliding with a left column gets the suffix
    right2 = right.withColumnRenamed("rv", "lv")
    cols = asof_join(left, right2, "k", "ts").columns
    assert "lv" in cols and "lv_r" in cols


def test_asof_preserves_left_rowcount(asof_frames):
    left, right = asof_frames
    assert asof_join(left, right, "k", "ts").count() == left.count()


# -------------------------------------------------------------- sessionize

def test_sessionize_boundaries(spark):
    rows = [
        Row(u=1, ts=_ts(0), i=1),
        Row(u=1, ts=_ts(10), i=2),   # gap == 10min -> same session
        Row(u=1, ts=_ts(21), i=3),   # gap 11min > 10 -> new session
        Row(u=2, ts=_ts(0), i=4),    # other key independent
    ]
    df = spark.createDataFrame(rows)
    out = {
        r["i"]: r["session_idx"]
        for r in sessionize(
            df, "u", "ts", 600, tiebreak_cols=["i"]
        ).collect()
    }
    assert out[1] == 1 and out[2] == 1  # gap exactly == 600s stays
    assert out[3] == 2
    assert out[4] == 1


def test_sessionize_fractional_gap_boundary(spark):
    """gap_seconds=0.29 is exactly 290000us (int() would truncate the
    fp product to 289999 and split the boundary pair)."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        Row(u=1, ts=base, i=1),
        Row(u=1, ts=base + dt.timedelta(microseconds=290000), i=2),
    ]
    out = sessionize(
        spark.createDataFrame(rows), "u", "ts", 0.29, tiebreak_cols=["i"]
    ).collect()
    assert {r["session_idx"] for r in out} == {1}


def test_sessionize_tiebreak_total_order(spark):
    # two rows at the SAME ts: tiebreak pins which one opens the session
    rows = [Row(u=1, ts=_ts(0), i=2), Row(u=1, ts=_ts(0), i=1)]
    df = spark.createDataFrame(rows)
    out = sessionize(df, "u", "ts", 1, tiebreak_cols=["i"]).collect()
    assert {r["session_idx"] for r in out} == {1}


# ---------------------------------------------------------------- sampling

def test_threshold_hex_scale():
    assert threshold_hex(0.0) == "00000000"
    assert threshold_hex(0.5) == "80000000"
    assert threshold_hex(1.0) == "g"  # lexicographically above every draw
    with pytest.raises(ValueError):
        threshold_hex(1.5)


def test_hash_sample_deterministic_and_fractional(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    a = hash_sample(docs, "doc_id", 0.3, seed="s")
    b = hash_sample(docs, "doc_id", 0.3, seed="s")
    assert sorted(r["doc_id"] for r in a.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in b.select("doc_id").collect()
    )
    # uniformity: expect ~0.3n, allow generous binomial slack
    assert abs(a.count() / n - 0.3) < 0.12
    # nested property: fraction 0.1 sample is a subset of fraction 0.3
    small = hash_sample(docs, "doc_id", 0.1, seed="s")
    assert small.exceptAll(a).count() == 0


def test_stratified_sample_respects_fractions(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    samp = stratified_hash_sample(
        docs, "doc_id", "lang", {"en": 1.0, "zh": 0.0}, default_fraction=0.5
    )
    by_lang = {
        r["lang"]: r["n"]
        for r in samp.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    total = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang["en"] == total["en"]     # fraction 1.0 keeps all
    assert "zh" not in by_lang              # fraction 0.0 keeps none
    for lang in set(total) - {"en", "zh"}:  # default applies elsewhere
        assert 0 < by_lang.get(lang, 0) < total[lang]


def test_train_test_split_partition(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lab = docs.select("doc_id", train_test_split_col("doc_id", 0.2))
    counts = {r["split"]: r["n"] for r in
              lab.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts["test"] + counts["train"] == docs.count()
    assert 0 < counts["test"] < counts["train"]


# ------------------------------------------------- simhash Hamming near-dup

def test_simhash_near_dup_exact_by_pigeonhole(spark, sf_dir):
    """hamming<=3 over 4 bands is exact: results equal the brute-force
    all-pairs Hamming filter on the same simhashes."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    banded = {
        r["doc_id"]: r["n_near_dups"]
        for r in simhash_near_dup_counts(docs, max_hamming=3).collect()
    }
    sh = simhash16(docs)
    a = sh.select(F.col("doc_id").alias("d1"), F.col("simhash").alias("s1"))
    b = sh.select(F.col("doc_id").alias("d2"), F.col("simhash").alias("s2"))
    brute_pairs = (
        a.crossJoin(b)
        .where(F.col("d1") < F.col("d2"))
        .where(F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))) <= 3)
    )
    brute = {
        r["doc_id"]: r["n"]
        for r in brute_pairs.select(
            F.explode(F.array("d1", "d2")).alias("doc_id")
        ).groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    for did, n in banded.items():
        assert n == brute.get(did, 0), did


def test_simhash64_near_dup_exact_and_banded(spark, sf_dir):
    """The 64-bit scale config: banded pigeonhole join == brute-force
    Hamming on the same 64-bit hashes, including sign-bit handling."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    sh = simhash64(docs)
    # 64-bit hashes occupy the full signed range (negatives appear)
    assert sh.where(F.col("simhash") < 0).count() > 0
    banded = {
        r["doc_id"]: r["n_near_dups"]
        for r in simhash_near_dup_counts(
            docs, max_hamming=3, bits=64, bands=4
        ).collect()
    }
    a = sh.select(F.col("doc_id").alias("d1"), F.col("simhash").alias("s1"))
    b = sh.select(F.col("doc_id").alias("d2"), F.col("simhash").alias("s2"))
    brute_pairs = (
        a.crossJoin(b)
        .where(F.col("d1") < F.col("d2"))
        .where(F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))) <= 3)
    )
    brute = {
        r["doc_id"]: r["n"]
        for r in brute_pairs.select(
            F.explode(F.array("d1", "d2")).alias("doc_id")
        ).groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    for did in {r["doc_id"] for r in docs.select("doc_id").collect()}:
        assert banded.get(did, 0) == brute.get(did, 0), did


# ---------------------------------------------------------------- IVF ANN

def test_ivf_assign_covers_every_vector(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cent = ivf_train(emb, n_centroids=8, refine_iters=1)
    assert cent.count() == 8
    assigned = ivf_assign(emb, cent)
    assert assigned.count() == emb.count()
    assert assigned.select("vec_id").distinct().count() == emb.count()


def test_ivf_topk_recall_vs_exact(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = [r["vec_id"] for r in cosine_top_k(emb, 0, k=10).collect()]
    # full probe == exhaustive: recall 1.0 by construction
    full = [
        r["vec_id"]
        for r in ivf_top_k(emb, 0, k=10, n_centroids=8, nprobe=8).collect()
    ]
    assert full == exact
    # partial probe: top-1 must survive (its cell is the nearest probe
    # on this corpus) and recall stays useful
    part = [
        r["vec_id"]
        for r in ivf_top_k(emb, 0, k=10, n_centroids=8, nprobe=2).collect()
    ]
    overlap = len(set(part) & set(exact))
    assert overlap >= 5, (part, exact)


def test_semantic_dedup_keep_first_and_cluster_confined(spark, sf_dir):
    from haskell_dbfunctor_spark.pipelines.similarity import (
        ivf_assign, ivf_train, semantic_dedup,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = semantic_dedup(emb, n_centroids=8, threshold=0.35).collect()
    assert len(out) == emb.count()  # every vector labeled
    by_id = {r.vec_id: r for r in out}
    dups = [r for r in out if r.dup_of is not None]
    assert dups, "corpus carries injected near-dups; none found"
    cids = {r.vec_id: r.cid for r in ivf_assign(
        emb, ivf_train(emb, 8, 1)
    ).collect()}
    for r in dups:
        assert not r.keep
        assert r.dup_of < r.vec_id  # keep-first: point to a LOWER id
        assert cids[r.dup_of] == r.cid  # never across clusters
    # the pointed-at keeper of a 2-vector dup pair is itself kept
    # unless it has an even-lower dup (chains allowed, cycles not)
    for r in dups:
        tgt = by_id[r.dup_of]
        assert tgt.keep or tgt.dup_of < r.dup_of


def test_temperature_sample_tau_extremes(spark, sf_dir):
    from haskell_dbfunctor_spark.pipelines.sampling import (
        temperature_sample,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    n_by_src = {
        r.source: r.n
        for r in docs.groupBy("source").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    # tau=1: proportional — every group keeps base_rate = everything
    all_kept = temperature_sample(docs, "doc_id", "source", tau=1.0)
    assert all_kept.count() == docs.count()
    assert all_kept.select("keep_rate").distinct().collect()[0][0] == 1.0
    # tau=0: inverse-frequency — expected kept counts equalize (the
    # largest group keeps ~min_n rows); md5-draw noise is a few
    # percent at these sizes, assert the flattening is material
    flat = temperature_sample(docs, "doc_id", "source", tau=0.0)
    kept = {
        r.source: r.n
        for r in flat.groupBy("source").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    mn = min(n_by_src.values())
    for s, nk in kept.items():
        assert abs(nk - mn) <= max(0.35 * mn, 12), (s, nk, mn)
    # determinism: same inputs, same sample
    again = temperature_sample(docs, "doc_id", "source", tau=0.0)
    assert sorted(r.doc_id for r in again.collect()) == sorted(
        r.doc_id for r in flat.collect()
    )


def test_sq8_codes_bounded_and_recall(spark, sf_dir):
    """SQ8 quantization: codes live in [-127, 127], the max-|e|
    element hits exactly +/-127, and quantized top-10 recalls >= 8 of
    the exact float top-10 at 64 dims (quantization error is small at
    int8 resolution)."""
    from haskell_dbfunctor_spark.pipelines.similarity import (
        cosine_top_k, sq8_quantize, sq8_top_k,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = sq8_quantize(emb)
    bounds = q.select(
        F.max(F.array_max("qvec")).alias("hi"),
        F.min(F.array_min("qvec")).alias("lo"),
    ).collect()[0]
    assert bounds.hi <= 127 and bounds.lo >= -127
    assert bounds.hi == 127 or bounds.lo == -127
    exact = {r.vec_id for r in cosine_top_k(emb, 0, k=10).collect()}
    sq8 = {r.vec_id for r in sq8_top_k(emb, 0, k=10).collect()}
    assert len(exact & sq8) >= 8
