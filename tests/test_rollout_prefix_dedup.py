"""rollout_prefix_dedup: conversation-level subsumption decisions.

A rollout is dropped when its full turn sequence is a prefix of a
LONGER rollout (abandoned retry) or an exact clone of an equal-length
rollout with a smaller conv id (keep-first). Partial overlap — shared
prefix but divergent tails — must NOT subsume either side.
"""

from pyspark.sql import Row

from haskell_dbfunctor_spark.pipelines.dedup_text import rollout_prefix_dedup


def _turns(spark, rows):
    return spark.createDataFrame(
        [Row(conv_id=c, event_id=i, content=t) for c, i, t in rows]
    )


def test_prefix_clone_and_divergence(spark):
    rows = [
        # A: the long original
        ("A", 1, "u#"), ("A", 2, "a#t1"), ("A", 3, "u#"), ("A", 4, "a#"),
        # B: exact prefix of A (first 2 turns) -> subsumed by A
        ("B", 1, "u#"), ("B", 2, "a#t1"),
        # C: exact clone of A -> subsumed (A < C)
        ("C", 1, "u#"), ("C", 2, "a#t1"), ("C", 3, "u#"), ("C", 4, "a#"),
        # D: shares A's 2-turn prefix then DIVERGES -> kept
        ("D", 1, "u#"), ("D", 2, "a#t1"), ("D", 3, "a#t9"),
        # E: unrelated -> kept
        ("E", 1, "x#"),
    ]
    out = {
        r["conv_id"]: r
        for r in rollout_prefix_dedup(_turns(spark, rows)).collect()
    }
    assert out["A"]["keep"] and out["A"]["dup_of"] is None
    assert not out["B"]["keep"] and out["B"]["dup_of"] == "A"
    assert not out["C"]["keep"] and out["C"]["dup_of"] == "A"
    assert out["D"]["keep"] and out["D"]["dup_of"] is None
    assert out["E"]["keep"]
    assert out["A"]["n_turns"] == 4 and out["B"]["n_turns"] == 2


def test_equal_length_clone_ring_keeps_exactly_one(spark):
    # three identical clones: only the smallest id survives, and both
    # losers point at it (min over subsuming candidates)
    rows = [(c, i, t) for c in ("k1", "k2", "k3")
            for i, t in [(1, "u#"), (2, "a#")]]
    out = {
        r["conv_id"]: r
        for r in rollout_prefix_dedup(_turns(spark, rows)).collect()
    }
    assert out["k1"]["keep"]
    assert out["k2"]["dup_of"] == "k1" and out["k3"]["dup_of"] == "k1"


def test_order_col_defines_sequence_not_insertion(spark):
    # same content multiset, different order -> NOT duplicates
    rows = [
        ("P", 1, "x"), ("P", 2, "y"),
        ("Q", 1, "y"), ("Q", 2, "x"),
    ]
    out = {
        r["conv_id"]: r
        for r in rollout_prefix_dedup(_turns(spark, rows)).collect()
    }
    assert out["P"]["keep"] and out["Q"]["keep"]
