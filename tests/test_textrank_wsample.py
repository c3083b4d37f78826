"""TextRank keyword scoring (pipelines/text.py:textrank_keywords) and
A-Res weighted sampling (pipelines/sampling.py:weighted_sample_n)."""
import math

from pyspark.sql import functions as F

from haskell_dbfunctor_spark.pipelines.sampling import weighted_sample_n
from haskell_dbfunctor_spark.pipelines.text import textrank_keywords


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_textrank_uniform_on_regular_graph(spark):
    """On a cycle (every node degree 2) PageRank's stationary point is
    uniform: every rank converges to exactly 1.0 regardless of
    iteration count — the closed-form anchor for the update rule."""
    docs = spark.createDataFrame(
        [(1, "a b c d e a")], "doc_id long, text string"
    )
    got = {r["word"]: (r["rank"], r["deg"]) for r in
           textrank_keywords(docs, iters=7, k=10).collect()}
    assert set(got) == {"a", "b", "c", "d", "e"}
    assert all(v == (1.0, 2) for v in got.values()), got


def test_textrank_star_graph_ranks_hub_highest(spark):
    """Star graph: the hub must out-rank every leaf, and leaves tie.
    hub: deg 4; leaves: deg 1 — damped PageRank keeps the hub above
    (1-d) + d and each leaf below 1."""
    docs = spark.createDataFrame(
        [(1, "x h y h z h w h")], "doc_id long, text string"
    )
    rows = textrank_keywords(docs, iters=10, k=10).collect()
    assert rows[0]["word"] == "h" and rows[0]["deg"] == 4
    leaf_ranks = {r["rank"] for r in rows[1:]}
    assert len(leaf_ranks) == 1  # symmetric leaves tie exactly
    assert rows[0]["rank"] > rows[1]["rank"]


def test_textrank_deterministic_across_runs(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = [(r["word"], r["rank"]) for r in textrank_keywords(docs, k=15).collect()]
    b = [(r["word"], r["rank"]) for r in textrank_keywords(docs, k=15).collect()]
    assert a == b
    # ranks carry (1-d) floor
    assert all(rank >= 0.15 for _, rank in a)


def test_weighted_sample_exact_n_and_determinism(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    s1 = sorted(r["doc_id"] for r in
                weighted_sample_n(docs, 30, "n_chars", "doc_id").collect())
    s2 = sorted(r["doc_id"] for r in
                weighted_sample_n(docs, 30, "n_chars", "doc_id").collect())
    assert s1 == s2 and len(s1) == 30
    # a different seed draws a different sample
    s3 = sorted(r["doc_id"] for r in
                weighted_sample_n(docs, 30, "n_chars", "doc_id", seed="x").collect())
    assert s3 != s1


def test_weighted_sample_bias_follows_weights(spark):
    """One heavy row (weight 1000) among 200 light rows (weight 1):
    across 40 independent seeds the heavy row must appear in a size-5
    sample far more often than any light row would (P_heavy >> P_light;
    binomial floor chosen so a correct implementation fails with
    probability < 1e-6)."""
    rows = [(i, 1000.0 if i == 0 else 1.0) for i in range(201)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    hits = 0
    for seed in range(40):
        got = {r["doc_id"] for r in
               weighted_sample_n(df, 5, "w", "doc_id", seed=str(seed)).collect()}
        assert len(got) == 5
        hits += 0 in got
    # E[hits] ≈ 40 * (1 - (1-p)^...) — with weight 1000 vs total 1200,
    # the heavy row wins a top-5 slot with prob > 0.95; require > 25
    assert hits > 25, hits


def test_weighted_sample_drops_nonpositive_weights(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, None), (None, 5.0)],
        "doc_id long, w double",
    )
    got = {r["doc_id"] for r in
           weighted_sample_n(df, 10, "w", "doc_id").collect()}
    assert got == {1}


def test_weighted_sample_priority_math_matches_formula(spark):
    """Pin the exact priority formula (ln(u)/w, u=(h32+1)/2^32, 6dp)
    against a Python recomputation for a tiny frame."""
    import hashlib

    rows = [(i, float(10 + i)) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = [r["doc_id"] for r in
           weighted_sample_n(df, 8, "w", "doc_id", seed="s").collect()]

    def pr(i, w):
        h = int(hashlib.md5(f"s{i}".encode()).hexdigest()[:8], 16)
        return round(math.log((h + 1) / 2 ** 32) / w, 6)

    exp = sorted(rows, key=lambda t: (-pr(*t), t[0]))[:8]
    assert got == [i for i, _ in exp]
