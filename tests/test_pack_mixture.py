"""Contract tests for the training-export packers: pack_sequences
(concat-and-chunk sequence packing with straddle bookkeeping) and
materialize_mixture (deterministic fractional epoch repetition off a
mixture_plan). Oracle parity for q137/q138 lives in
test_entry_oracle.py; these pin the operator semantics directly.
"""

from pyspark.sql import functions as F

from haskell_dbfunctor_spark.pipelines.sampling import (
    materialize_mixture, mixture_plan, pack_sequences,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_pack_sequences_exact_layout(spark):
    # token stream in doc_id order: a=3, b=6, c=0, d=4 with seq_len=4
    # offsets: a@0, b@3, c@9, d@9 -> stream [0,4) [4,8) [8,12) ...
    df = _docs(spark, [
        ("a", "w w w"),
        ("b", "x x x x x x"),
        ("c", "   "),          # whitespace-only -> 0 tokens
        ("d", "y y y y"),
    ])
    got = {
        r["doc_id"]: (r["n_tokens"], r["seq_id"], r["offset_in_seq"],
                      r["n_seqs"])
        for r in pack_sequences(df, 4).collect()
    }
    assert got["a"] == (3, 0, 0, 1)      # tokens 0-2, inside seq 0
    assert got["b"] == (6, 0, 3, 3)      # tokens 3-8: seqs 0,1,2
    assert got["c"] == (0, 2, 1, 1)      # zero-width at offset 9
    assert got["d"] == (4, 2, 1, 2)      # tokens 9-12: seqs 2,3


def test_pack_sequences_deterministic_under_repartition(spark):
    df = _docs(
        spark,
        [(f"d{i:03d}", "t " * (i % 7 + 1)) for i in range(200)],
    )
    a = sorted(map(tuple, pack_sequences(df, 16).collect()))
    b = sorted(map(tuple, pack_sequences(df.repartition(13), 16).collect()))
    assert a == b


def _plan(spark, rows):
    return spark.createDataFrame(rows, "source string, epochs double")


def test_materialize_integer_epochs_exact(spark):
    docs = spark.createDataFrame(
        [(f"d{i}", "s") for i in range(20)], "doc_id string, source string"
    )
    plan = _plan(spark, [("s", 3.0)])
    out = materialize_mixture(docs, plan, "source")
    assert out.count() == 60
    per = {r[0]: r[1] for r in out.groupBy("doc_id").count().collect()}
    assert set(per.values()) == {3}


def test_materialize_fractional_bounds_and_determinism(spark):
    docs = spark.createDataFrame(
        [(f"d{i}", "s") for i in range(400)], "doc_id string, source string"
    )
    plan = _plan(spark, [("s", 1.5)])
    out = materialize_mixture(docs, plan, "source")
    per = {r[0]: r[1] for r in out.groupBy("doc_id").count().collect()}
    # every doc gets its guaranteed floor copy; at most one extra
    assert set(per) == {f"d{i}" for i in range(400)}
    assert set(per.values()) <= {1, 2}
    total = sum(per.values())
    assert 520 <= total <= 680  # ~600 expected, md5-uniform draw
    again = sorted(
        map(tuple, materialize_mixture(docs, plan, "source").collect())
    )
    assert again == sorted(map(tuple, out.collect()))
    # a different seed flips different fractional draws
    other = materialize_mixture(docs, plan, "source", seed="v2")
    assert sorted(map(tuple, other.collect())) != again


def test_materialize_hits_plan_tokens(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id", "source",
            F.size(
                F.filter(F.split("text", " "), lambda w: w != "")
            ).cast("long").alias("n_toks"),
        )
    )
    plan = mixture_plan(docs, "source", "n_toks", target_total=100000)
    got = (
        materialize_mixture(docs, plan, "source")
        .groupBy("source")
        .agg(F.sum("n_toks").alias("realized"))
        .join(plan.select("source", "planned_tokens"), "source")
        .collect()
    )
    assert got
    for r in got:
        # fractional-copy sampling error ~ sqrt(n_docs) * avg_doc_toks;
        # at sf0.001 each source plans ~5k tokens — allow 25%
        assert abs(r["realized"] - r["planned_tokens"]) <= max(
            0.25 * r["planned_tokens"], 200
        )
