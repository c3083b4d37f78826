"""Round-6 optimization: small-vocabulary BITSET fast path for the
exact set-similarity family (pipelines/dedup_text.py).

The dispatch contract: a corpus whose vocabulary fits in 62 bits
answers the exact Jaccard / containment counts from the distinct-mask
popcount join; anything larger falls back to the unchanged salted /
prefix shingle-join paths. Results must be identical either way —
the equivalence suites (test_prefix_filter_dedup, test_containment_*)
now exercise bitset-vs-baseline implicitly; this file pins the
dispatch mechanics and the bitset-only edge cases.
"""

import pyspark.sql.functions as F
import pytest

from haskell_dbfunctor_spark.pipelines.dedup_text import (
    _BITSET_VOCAB_CAP,
    _bitset_vocab,
    _doc_masks,
    containment_dup_counts,
    containment_dup_counts_prefix,
    near_dup_counts,
)


def _cc(df):
    return {r[0]: r[1] for r in df.collect()}


def test_vocab_probe_caps(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i} w{i + 1} shared") for i in range(100)],
        "doc_id long, text string",
    )
    # 102 distinct words > 62 -> probe refuses
    assert _bitset_vocab(docs) is None
    small = spark.createDataFrame(
        [(1, "a b"), (2, "b c"), (3, "")], "doc_id long, text string"
    )
    assert _bitset_vocab(small) == ["a", "b", "c"]


def test_doc_masks(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "c"), (3, ""), (4, "  ")],
        "doc_id long, text string",
    )
    vocab = _bitset_vocab(docs)
    got = {r["doc_id"]: (r["mask"], r["n"]) for r in _doc_masks(docs, vocab).collect()}
    # vocab sorted: a=1, b=2, c=4
    assert got == {1: (3, 2), 2: (4, 1), 3: (0, 0), 4: (0, 0)}


def test_large_vocab_falls_back_same_result(spark):
    # 70 distinct words: bitset refuses, salted path answers; planted
    # near-dup pair must still be found
    rows = [(i, " ".join(f"w{j}" for j in range(i, i + 8))) for i in range(60)]
    rows += [(100, "w0 w1 w2 w3 w4 w5 w6 w7"), (101, "x y z")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assert _bitset_vocab(docs) is None
    counts = _cc(near_dup_counts(docs, 0.8))
    assert counts[0] == 1 and counts[100] == 1 and counts[101] == 0


def test_equal_size_containment_tiebreak(spark):
    # equal-size distinct sets with overlap >= t*n: contained side is
    # the HIGHER doc id, counted per doc pair — the bitset eq leg
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),           # t0..t9
            (2, " ".join(f"t{i}" for i in range(1, 10)) + " t10"),  # t1..t10
            (3, " ".join(f"t{i}" for i in range(10))),           # == doc 1
        ],
        "doc_id long, text string",
    )
    # doc1 vs doc2: |A|=|B|=10, c=9 >= 0.9*10 -> higher id contained
    got = _cc(containment_dup_counts_prefix(docs, 0.9))
    want = _cc(containment_dup_counts(docs, 0.9))
    assert got == want
    # doc2 contained by doc1 (tie, higher id); doc3 contained by 1 and 2
    assert got == {1: 0, 2: 1, 3: 2}


def test_identical_group_counts(spark):
    docs = spark.createDataFrame(
        [(i, "a b c d e") for i in range(5)] + [(9, "p q r s t")],
        "doc_id long, text string",
    )
    nd = _cc(near_dup_counts(docs, 0.8))
    assert all(nd[i] == 4 for i in range(5)) and nd[9] == 0
    ct = _cc(containment_dup_counts_prefix(docs, 0.9))
    # within the identical group each doc's containers = smaller ids
    assert ct == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 9: 0}


def test_threshold_one_exact_only(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a b c")], "doc_id long, text string"
    )
    assert _cc(near_dup_counts(docs, 1.0)) == _cc(
        near_dup_counts(docs, 1.0, bitset=False)
    ) == {1: 1, 2: 1, 3: 0}


def test_cap_constant_sane():
    assert _BITSET_VOCAB_CAP <= 62


def test_pairs_bitset_matches_counts(spark):
    """Edge-list bitset path: counting each doc's incident edges must
    reproduce near_dup_counts exactly (both paths, both thresholds)."""
    from haskell_dbfunctor_spark.pipelines.dedup_text import (
        near_dup_pairs_prefix,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "a b c d f"),
         (4, "x y"), (5, "x y z"), (6, "")],
        "doc_id long, text string",
    )
    for t in (0.6, 0.8, 1.0):
        pairs = near_dup_pairs_prefix(docs, t).collect()
        assert all(r["d1"] < r["d2"] for r in pairs)
        assert len({(r[0], r[1]) for r in pairs}) == len(pairs)  # unique
        inc = {}
        for r in pairs:
            inc[r[0]] = inc.get(r[0], 0) + 1
            inc[r[1]] = inc.get(r[1], 0) + 1
        want = _cc(near_dup_counts(docs, t, bitset=False))
        got = {i: inc.get(i, 0) for i in want}
        assert got == want, (t, got, want)
