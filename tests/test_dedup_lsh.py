"""MinHash-LSH near-dup path (pipelines/dedup_text.py): end-to-end
equivalence to the exact quadratic path, candidate sanity, and the
single-pass plan shape (no per-band signature recompute).

This is the 100 TB replacement for the reference's all-pairs join
semantics (/root/reference/src/RTable/Core.hs:2704-2715).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from haskell_dbfunctor_spark.pipelines.dedup_text import (
    lsh_candidate_pairs,
    near_dup_counts,
    near_dup_counts_lsh,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_lsh_matches_exact_near_dup(spark, sf_dir):
    """Recall check: at k=16/bands=8 the LSH path reproduces the exact
    all-pairs Jaccard counts on the test corpus (precision is 1.0 by
    construction — candidates are verified with exact Jaccard)."""
    docs = _docs(spark, sf_dir)
    exact = {
        r["doc_id"]: r["n_near_dups"]
        for r in near_dup_counts(docs, threshold=0.8).collect()
    }
    lsh = {
        r["doc_id"]: r["n_near_dups"]
        for r in near_dup_counts_lsh(docs, threshold=0.8, k=16, bands=8).collect()
    }
    assert lsh == exact


def test_lsh_candidates_are_supersets_of_identical_docs(spark):
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),        # identical to 1
        (3, "alpha beta gamma delta epsilon"),  # J=0.8 vs 1/2
        (4, "zeta eta theta iota kappa"),       # disjoint
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    cand = {
        (r["d1"], r["d2"])
        for r in lsh_candidate_pairs(docs, k=16, bands=8, salt=4,
                                     num_partitions=8).collect()
    }
    # identical docs share every band bucket — always candidates
    assert (1, 2) in cand
    # ordering contract
    assert all(d1 < d2 for d1, d2 in cand)
    # verified output: 1,2 are mutual near-dups; 4 has none
    counts = {
        r["doc_id"]: r["n_near_dups"]
        for r in near_dup_counts_lsh(docs, threshold=0.9, k=16, bands=8,
                                     salt=4, num_partitions=8).collect()
    }
    assert counts[1] >= 1 and counts[2] >= 1 and counts[4] == 0


def test_lsh_plan_single_signature_pass(spark, sf_dir):
    """The banded signature frame is computed ONCE: materialized
    (localCheckpoint) by default, so the candidate join plans ZERO
    corpus scans — both sides read the checkpointed signatures. The
    lazy fallback (materialize_sigs=False) plans exactly 2 corpus scans
    (one per self-join side) — never `bands`x, which is what a
    per-band unionAll would cost (bands=8 -> 8 scans)."""
    docs = _docs(spark, sf_dir)
    mat = lsh_candidate_pairs(
        docs, k=16, bands=8
    )._jdf.queryExecution().executedPlan().toString()
    assert mat.count("Scan parquet") == 0, mat
    assert "ExistingRDD" in mat or "Scan ExistingRDD" in mat

    lazy = lsh_candidate_pairs(
        docs, k=16, bands=8, materialize_sigs=False
    )._jdf.queryExecution().executedPlan().toString()
    n_scans = lazy.count("Scan parquet")
    assert n_scans == 2, f"expected 2 corpus scans (self-join), got {n_scans}"


def test_size_prefilter_drops_incompatible_pairs(spark):
    rows = [
        (1, "a b c d e f g h i j"),   # 10 words
        (2, "a b c"),                 # 3 words: sizes incompatible at t=0.8
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    cand = lsh_candidate_pairs(
        docs, k=4, bands=4, threshold=0.8, salt=2, num_partitions=4
    ).collect()
    assert cand == []


def test_lsh_precision_is_one_on_random_corpora(spark):
    """Property (hypothesis): on arbitrary corpora, the LSH path's
    verified pairs are a SUBSET of the exact near-dup pairs (precision
    1.0 by construction — every candidate is exact-Jaccard-checked), so
    per-doc counts never exceed the exact counts; and identical docs
    are always found (they share every band bucket)."""
    from hypothesis import given, settings, strategies as st

    words = st.sampled_from(
        ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    )
    doc = st.lists(words, min_size=1, max_size=8).map(" ".join)

    @settings(max_examples=5, deadline=None)
    @given(st.lists(doc, min_size=2, max_size=8))
    def prop(texts):
        rows = [(i, t) for i, t in enumerate(texts)]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        exact = {
            r["doc_id"]: r["n_near_dups"]
            for r in near_dup_counts(docs, 0.8, salt=2).collect()
        }
        lsh = {
            r["doc_id"]: r["n_near_dups"]
            for r in near_dup_counts_lsh(
                docs, 0.8, k=8, bands=4, salt=2, num_partitions=4
            ).collect()
        }
        assert set(lsh) == set(exact)
        for d in exact:
            assert lsh[d] <= exact[d], "LSH found a pair exact missed"
        # identical word sets are never missed
        sets_ = {i: frozenset(t.split()) for i, t in rows}
        for i in sets_:
            twins = sum(
                1 for j in sets_ if j != i and sets_[j] == sets_[i]
            )
            assert lsh[i] >= twins

    prop()
