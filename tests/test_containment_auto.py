"""Auto-selected containment dedup (VERDICT r04 item 2):
containment_density_probe — one cheap corpus-distribution probe (doc
count + one aggregation over the vocabulary-sized df relation) —
picks all-pairs / prefix / sketch per corpus and derives max_df for
the sketch; containment_dup_counts_auto dispatches on it. The probe
changes the PLAN, never the result: count parity vs the exact
all-pairs baseline is asserted on every corpus shape."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from haskell_dbfunctor_spark.pipelines.dedup_text import (
    containment_density_probe,
    containment_dup_counts,
    containment_dup_counts_auto,
)


def _zipfian_long_docs(spark, n_docs=200):
    """Mini version of bench --containment-cost's planted corpus:
    1000-token docs, a common head (df = n_docs/5) + df<=2 rare tail;
    every (10k, 10k+1) pair plants containment 0.995."""
    planted = F.col("id") % 10 == 1
    base = F.when(planted, F.col("id") - 1).otherwise(F.col("id"))
    common = F.transform(
        F.sequence(F.lit(0), F.lit(9)),
        lambda j: F.concat(F.lit("c"), F.pmod(base * 7 + j, F.lit(50))),
    )
    rare = F.transform(
        F.sequence(F.lit(0), F.lit(989)),
        lambda j: F.concat(
            F.lit("r"),
            F.when(planted & (j >= 985), F.col("id") * 990 + j)
            .otherwise(base * 990 + j),
        ),
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.concat(common, rare)).alias("text"),
    )


def _dense_short_docs(spark, n_docs=200, vocab=30, words_per=20):
    """sf-documents shape: tiny vocabulary, short docs — every word is
    hot (df ~ n_docs * words_per / vocab >> hot_cut)."""
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(words_per - 1)),
        lambda j: F.concat(
            F.lit("w"), F.pmod(F.col("id") * 13 + j * 7, F.lit(vocab))
        ),
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", toks).alias("text"),
    )


def _counts(df):
    return {r["doc_id"]: r["n_containers"] for r in df.collect()}


def test_probe_picks_sketch_on_zipfian_long_docs(spark):
    docs = _zipfian_long_docs(spark).cache()
    docs.count()
    p = containment_density_probe(docs, 0.9)
    assert p["path"] == "sketch"
    assert p["max_df"] == p["hot_cut"] == 64
    assert p["stop_mass"] <= 0.3 and p["mean_len"] >= p["crossover_len"]
    got = _counts(containment_dup_counts_auto(docs, 0.9, probe=p))
    want = _counts(containment_dup_counts(docs, 0.9))
    assert got == want
    assert sum(got.values()) == 20  # the planted containments
    docs.unpersist()


def test_probe_picks_prefix_on_dense_short_docs(spark):
    docs = _dense_short_docs(spark).cache()
    docs.count()
    p = containment_density_probe(docs, 0.9)
    assert p["path"] == "prefix"
    # every word hot: the stop set would empty the sampling pools
    assert p["stop_mass"] > 0.9
    got = _counts(containment_dup_counts_auto(docs, 0.9, probe=p))
    want = _counts(containment_dup_counts(docs, 0.9))
    assert got == want
    docs.unpersist()


def test_probe_picks_allpairs_on_tiny_corpus(spark):
    docs = spark.createDataFrame(
        [(i, f"u{i}a u{i}b u{i}c shared{i % 3}") for i in range(20)]
        + [(100, "u5a u5b u5c shared2 extra")],
        "doc_id long, text string",
    ).cache()
    docs.count()
    p = containment_density_probe(docs, 0.9)
    assert p["path"] == "allpairs"
    got = _counts(containment_dup_counts_auto(docs, 0.9, probe=p))
    want = _counts(containment_dup_counts(docs, 0.9))
    assert got == want
    docs.unpersist()


def test_auto_probes_when_not_supplied(spark):
    docs = _dense_short_docs(spark, n_docs=60, vocab=12, words_per=8)
    got = _counts(containment_dup_counts_auto(docs, 0.9))
    want = _counts(containment_dup_counts(docs, 0.9))
    assert got == want


def test_sf_documents_probe_prefix(spark):
    """The real sf corpus (31-word vocabulary, median df ~ 0.8*n_docs)
    must land on the prefix path — the q191 entry's pinned decision."""
    sf = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    p = containment_density_probe(docs.where(F.col("doc_id") % 2 == 1))
    assert p["path"] == "prefix"
    assert p["stop_mass"] > 0.9
