"""near_dup_counts_prefix == near_dup_counts (exact prefix filtering).

The prefix-filter theorem says no true pair is lost; these tests pin
the equivalence on edge shapes the sf-data oracle run may not cover:
single-token docs (prefix length L=1), exact clones, just-below /
just-above threshold, and a seeded random corpus.
"""

import random

from pyspark.sql import Row

from haskell_dbfunctor_spark.pipelines.dedup_text import (
    containment_dup_counts,
    containment_dup_counts_prefix,
    near_dup_counts,
    near_dup_counts_prefix,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def _counts(df):
    return {r["doc_id"]: r["n_near_dups"] for r in df.collect()}


def _assert_equiv(spark, texts, threshold=0.8):
    d = _docs(spark, texts)
    assert _counts(near_dup_counts_prefix(d, threshold)) == _counts(
        near_dup_counts(d, threshold)
    )


def test_edge_shapes(spark):
    _assert_equiv(spark, [
        "a",                       # single token, L = 1
        "a",                       # exact clone of a 1-token doc
        "a b c d e",
        "a b c d e",               # exact clone
        "a b c d f",               # J = 4/6 = 0.667 < 0.8
        "a b c d e f",             # J = 5/6 = 0.833 >= 0.8 vs clone pair
        "x y z",                   # disjoint
        "",                        # empty text -> no tokens
    ])


def test_threshold_boundary(spark):
    # J exactly == t must be included by BOTH (>= threshold)
    # sets {a,b,c,d} vs {a,b,c,d,e}: J = 4/5 = 0.8
    _assert_equiv(spark, ["a b c d", "a b c d e"], threshold=0.8)
    d = _docs(spark, ["a b c d", "a b c d e"])
    assert _counts(near_dup_counts_prefix(d, 0.8)) == {0: 1, 1: 1}


def test_random_corpus_seeded(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    texts = []
    for _ in range(40):
        base = rng.sample(vocab, rng.randint(1, 12))
        texts.append(" ".join(base))
        if rng.random() < 0.4:  # planted near-dup: drop/keep one token
            mut = list(base)
            if len(mut) > 1 and rng.random() < 0.5:
                mut.pop(rng.randrange(len(mut)))
            texts.append(" ".join(mut))
    _assert_equiv(spark, texts)


# ---- containment (asymmetric prefix filter) ----


def _ccounts(df):
    return {r["doc_id"]: r["n_containers"] for r in df.collect()}


def _assert_containment_equiv(spark, texts, threshold=0.9):
    d = _docs(spark, texts)
    assert _ccounts(
        containment_dup_counts_prefix(d, threshold)
    ) == _ccounts(containment_dup_counts(d, threshold))


def test_containment_edge_shapes(spark):
    _assert_containment_equiv(spark, [
        "a",                       # 1-token doc contained everywhere 'a' is
        "a",                       # exact clone tiebreak: higher id contained
        "a b c d e f g h i j",     # container
        "a b c d e f g h i",       # 9/9 contained in the 10-token doc
        "a b c d e f g h x",       # 8/9 = 0.889 < 0.9
        "x y z",                   # disjoint
        "",                        # empty -> no tokens
    ])
    d = _docs(spark, ["a b c", "a b c d e f"])
    # {a,b,c} fully inside the 6-token doc: containment 1.0
    assert _ccounts(containment_dup_counts_prefix(d, 0.9)) == {0: 1, 1: 0}


def test_containment_threshold_boundary(spark):
    # c / |A| exactly == t included by BOTH (>=): 9/10 = 0.9
    texts = ["a b c d e f g h i j",
             "a b c d e f g h i x y z"]  # A=doc0? sizes 10 vs 12
    _assert_containment_equiv(spark, texts, threshold=0.9)
    d = _docs(spark, texts)
    assert _ccounts(containment_dup_counts_prefix(d, 0.9)) == {0: 1, 1: 0}


def test_containment_random_corpus_seeded(spark):
    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(25)]
    texts = []
    for _ in range(35):
        base = rng.sample(vocab, rng.randint(1, 10))
        texts.append(" ".join(base))
        if rng.random() < 0.5:  # planted container: superset doc
            sup = list(dict.fromkeys(
                base + rng.sample(vocab, rng.randint(0, 6))
            ))
            texts.append(" ".join(sup))
    _assert_containment_equiv(spark, texts)


# ---- containment (bottom-k sketch, q189) ----


def _assert_sketch_equiv(spark, texts, threshold=0.9, k=8):
    from haskell_dbfunctor_spark.pipelines.dedup_text import (
        containment_dup_counts_sketch,
    )

    d = _docs(spark, texts)
    assert _ccounts(
        containment_dup_counts_sketch(d, threshold, k=k)
    ) == _ccounts(containment_dup_counts(d, threshold))


def test_sketch_edge_shapes(spark):
    # every doc here has <= 10 distinct tokens, so n - ceil(t*n) < k
    # and the sketch is EXACT by pigeonhole (the q189 regime)
    _assert_sketch_equiv(spark, [
        "a",
        "a",
        "a b c d e f g h i j",
        "a b c d e f g h i",
        "a b c d e f g h x",      # 8/9 = 0.889 < 0.9
        "x y z",
        "",
    ])


def test_sketch_threshold_boundary(spark):
    _assert_sketch_equiv(
        spark,
        ["a b c d e f g h i j", "a b c d e f g h i x y z"],
        threshold=0.9,
    )


def test_sketch_random_corpus_seeded(spark):
    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(25)]
    texts = []
    for _ in range(35):
        base = rng.sample(vocab, rng.randint(1, 10))
        texts.append(" ".join(base))
        if rng.random() < 0.5:
            sup = list(dict.fromkeys(
                base + rng.sample(vocab, rng.randint(0, 6))
            ))
            texts.append(" ".join(sup))
    _assert_sketch_equiv(spark, texts)


def test_sketch_one_sided_error_under_tiny_k(spark):
    """With k below the pigeonhole bound the sketch may LOSE pairs but
    can never invent one (verify is exact): every count <= the exact
    count."""
    from haskell_dbfunctor_spark.pipelines.dedup_text import (
        containment_dup_counts_sketch,
    )

    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(60)]
    texts = []
    for _ in range(25):
        base = rng.sample(vocab, rng.randint(20, 40))
        texts.append(" ".join(base))
        if rng.random() < 0.6:
            texts.append(" ".join(base[: int(len(base) * 0.95)]))
    d = _docs(spark, texts)
    exact = _ccounts(containment_dup_counts(d, 0.9))
    sk = _ccounts(containment_dup_counts_sketch(d, 0.9, k=1))
    assert set(sk) == set(exact)
    assert all(sk[i] <= exact[i] for i in exact)
