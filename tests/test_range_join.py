"""Edge semantics of operators/rangejoin.py:bucketized_range_join and
pipelines/dedup_text.py:cross_corpus_near_dups.

The oracle test (test_entry_oracle.py q83/q85) pins the end-to-end
answer against DuckDB; these tests pin the EDGE behavior the oracle
corpus may not exercise: half-open interval boundaries, windows
spanning many buckets, windows ending exactly on a bucket edge,
equi-key confinement, and LSH capture vs the exact answer.
"""

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from haskell_dbfunctor_spark.operators.rangejoin import bucketized_range_join
from haskell_dbfunctor_spark.pipelines.dedup_text import cross_corpus_near_dups

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(seconds, micros=0):
    return T0 + dt.timedelta(seconds=seconds, microseconds=micros)


def _frames(spark, windows, points):
    w = spark.createDataFrame(
        [Row(window_id=i, w_start=s, w_end=e) for i, (s, e) in enumerate(windows)]
    )
    p = spark.createDataFrame(
        [Row(point_id=i, ts=t) for i, t in enumerate(points)]
    )
    return w, p


def _pairs(spark, windows, points, **kw):
    w, p = _frames(spark, windows, points)
    out = bucketized_range_join(
        w, p, w_start="w_start", w_end="w_end", p_ts="ts", **kw
    )
    return sorted(
        (r.window_id, r.point_id) for r in out.select("window_id", "point_id").collect()
    )


def test_half_open_boundaries(spark):
    # [start, end): point AT start matches, point AT end does not
    got = _pairs(
        spark,
        windows=[(_ts(0), _ts(100))],
        points=[_ts(0), _ts(99, 999999), _ts(100)],
        bucket_s=60,
    )
    assert got == [(0, 0), (0, 1)]


def test_window_spanning_many_buckets(spark):
    # 1h window with 60s buckets: explodes to 60 buckets; every
    # contained point matches exactly once (no dup pairs from the
    # explode because each point has ONE bucket)
    pts = [_ts(s) for s in (0, 59, 60, 1800, 3599, 3600, 7200)]
    got = _pairs(
        spark, windows=[(_ts(0), _ts(3600))], points=pts, bucket_s=60
    )
    assert got == [(0, i) for i in range(5)]


def test_window_ending_on_bucket_edge(spark):
    # window [30, 60) with bucket_s=60 must NOT explode into bucket 1:
    # a point at t=60 (bucket 1) is outside the half-open window
    got = _pairs(
        spark,
        windows=[(_ts(30), _ts(60))],
        points=[_ts(59, 999999), _ts(60)],
        bucket_s=60,
    )
    assert got == [(0, 0)]


def test_microsecond_precision(spark):
    # sub-second boundaries compare at microsecond precision
    got = _pairs(
        spark,
        windows=[(_ts(0, 500000), _ts(0, 500002))],
        points=[_ts(0, 499999), _ts(0, 500000), _ts(0, 500001), _ts(0, 500002)],
        bucket_s=1,
    )
    assert got == [(0, 1), (0, 2)]


def test_equi_cols_confine_matches(spark):
    w = spark.createDataFrame(
        [Row(window_id=0, user_id=1, w_start=_ts(0), w_end=_ts(100)),
         Row(window_id=1, user_id=2, w_start=_ts(0), w_end=_ts(100))]
    )
    p = spark.createDataFrame(
        [Row(point_id=0, user_id=1, ts=_ts(50)),
         Row(point_id=1, user_id=2, ts=_ts(50)),
         Row(point_id=2, user_id=3, ts=_ts(50))]
    )
    out = bucketized_range_join(
        w, p, w_start="w_start", w_end="w_end", p_ts="ts",
        bucket_s=60, equi_cols=["user_id"],
    )
    got = sorted((r.window_id, r.point_id)
                 for r in out.select("window_id", "point_id").collect())
    assert got == [(0, 0), (1, 1)]
    # collision suffix: point-side user_id surfaced as user_id_p
    assert "user_id_p" in out.columns and "user_id" in out.columns


def test_no_matches_empty_result(spark):
    got = _pairs(
        spark, windows=[(_ts(0), _ts(10))], points=[_ts(20)], bucket_s=60
    )
    assert got == []


# ------------------------------------------------------- cross-corpus

def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def test_cross_corpus_only_cross_pairs(spark):
    # two identical docs INSIDE the corpus never pair; the incoming
    # doc matches its corpus twin with jaccard 1.0
    inc = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta")])
    corp = _docs(spark, [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),
        (3, "totally different words here now ok"),
    ])
    got = cross_corpus_near_dups(inc, corp, num_partitions=8, salt=4).collect()
    assert len(got) == 1
    r = got[0]
    # best match ties (doc 1 and 2 both J=1.0) break to the SMALLEST id
    assert (r.in_doc_id, r.match_doc_id, r.jaccard) == (100, 1, 1.0)


def test_cross_corpus_below_threshold_dropped(spark):
    inc = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta")])
    corp = _docs(spark, [(1, "alpha beta nothing else shared xx yy zz qq ww")])
    got = cross_corpus_near_dups(inc, corp, threshold=0.8,
                                 num_partitions=8, salt=4).collect()
    assert got == []


def test_cross_corpus_empty_incoming(spark):
    inc = _docs(spark, [(100, "alpha beta")]).where(F.lit(False))
    corp = _docs(spark, [(1, "alpha beta")])
    assert cross_corpus_near_dups(inc, corp, num_partitions=8,
                                  salt=4).count() == 0


@pytest.mark.parametrize("k,bands", [(16, 8)])
def test_cross_corpus_matches_exact_on_testdata(spark, sf_dir, k, bands):
    """LSH capture == exact all-pairs answer on the test corpus (the
    recall=1.0 claim in the docstring, checked engine-side)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    inc = docs.where(F.col("doc_id") % 7 == 0)
    corp = docs.where(F.col("doc_id") % 7 != 0)
    got = {
        (r.in_doc_id, r.match_doc_id)
        for r in cross_corpus_near_dups(inc, corp, k=k, bands=bands,
                                        num_partitions=16).collect()
    }
    # exact cross-side all-pairs via word-set intersection counts
    dw = docs.select(
        "doc_id",
        F.explode(F.array_distinct(
            F.filter(F.split("text", " "), lambda w: w != "")
        )).alias("word"),
    )
    sz = dw.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = dw.where(F.col("doc_id") % 7 == 0).withColumnRenamed("doc_id", "d1")
    b = dw.where(F.col("doc_id") % 7 != 0).withColumnRenamed("doc_id", "d2")
    pairs = (
        a.join(b, "word").groupBy("d1", "d2").agg(F.count(F.lit(1)).alias("c"))
        .join(sz.withColumnRenamed("doc_id", "d1")
                .withColumnRenamed("n", "n1"), "d1")
        .join(sz.withColumnRenamed("doc_id", "d2")
                .withColumnRenamed("n", "n2"), "d2")
        .withColumn("j", F.col("c") / (F.col("n1") + F.col("n2") - F.col("c")))
        .where(F.col("j") >= 0.8)
    )
    best = pairs.groupBy("d1").agg(
        F.max(F.struct("j", (-F.col("d2")).alias("neg"))).alias("b")
    ).select("d1", (-F.col("b.neg")).alias("d2"))
    want = {(r.d1, r.d2) for r in best.collect()}
    assert got == want


# ------------------------------------------- percentile trim / sample-n

def test_percentile_trim_approx_close_to_exact(spark, sf_dir):
    """Sketch-vs-exact parity, measured on ONE group so the comparison
    is about the GK sketch, not tiny-strata edge definitions (exact
    interpolates between order stats, the sketch returns an actual
    element — on a 2-doc stratum those bands legitimately differ at
    both edges)."""
    from haskell_dbfunctor_spark.pipelines.text import length_percentile_trim

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn("source", F.lit("all"))
    )
    ne = length_percentile_trim(docs, exact=True).where("keep").count()
    na = length_percentile_trim(docs, exact=False).where("keep").count()
    total = docs.count()
    # element-vs-interpolation costs <= 1 rank per band edge; GK at
    # accuracy 10000 adds <= total/10000 per edge
    assert abs(ne - na) <= 2 + 2 * (total // 10000 + 1)


def test_uniform_sample_n_exact_count_and_stability(spark, sf_dir):
    from haskell_dbfunctor_spark.pipelines.sampling import uniform_sample_n

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = uniform_sample_n(docs, 25, seed="s1")
    ids_a = sorted(r.doc_id for r in a.select("doc_id").collect())
    assert len(ids_a) == 25
    # stable under repartitioning
    ids_b = sorted(
        r.doc_id
        for r in uniform_sample_n(docs.repartition(13), 25, seed="s1")
        .select("doc_id").collect()
    )
    assert ids_a == ids_b
    # a different seed draws a different set
    ids_c = sorted(
        r.doc_id
        for r in uniform_sample_n(docs, 25, seed="s2")
        .select("doc_id").collect()
    )
    assert ids_a != ids_c
