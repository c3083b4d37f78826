"""Containment dedup (pipelines/dedup_text.py:containment_dup_counts)
and time-range rolling aggregates (operators/temporal.py:
rolling_range_agg) — hand-computed fixtures pin the semantics the
q151/q152 oracles check statistically.
"""

import datetime

from pyspark.sql import functions as F

from haskell_dbfunctor_spark.operators import rolling_range_agg
from haskell_dbfunctor_spark.pipelines.dedup_text import (
    containment_dup_counts,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_containment_subset_detected(spark):
    # doc 1's word set {a b c} is fully inside doc 2's {a b c d e f}:
    # containment(1→2) = 3/3 = 1.0, but Jaccard = 3/6 = 0.5 — the case
    # the symmetric measure misses at threshold 0.9
    docs = _docs(spark, [(1, "a b c"), (2, "a b c d e f")])
    out = {r["doc_id"]: r["n_containers"] for r in
           containment_dup_counts(docs, 0.9).collect()}
    assert out == {1: 1, 2: 0}


def test_containment_exact_dup_drops_one_side(spark):
    # identical word sets: sizes tie, so only the HIGHER id is contained
    docs = _docs(spark, [(1, "x y z"), (2, "x y z")])
    out = {r["doc_id"]: r["n_containers"] for r in
           containment_dup_counts(docs, 0.9).collect()}
    assert out == {1: 0, 2: 1}


def test_containment_threshold_and_multiplicity(spark):
    # doc 1 = {a b c d e}: 4/5 = 0.8 shared with doc 2 -> below 0.9;
    # doc 3 = {a b} is contained in 1, 2 AND 4 (three containers)
    docs = _docs(spark, [
        (1, "a b c d e"),
        (2, "a b c d x"),
        (3, "a b"),
        (4, "a b q r s"),
    ])
    out = {r["doc_id"]: r["n_containers"] for r in
           containment_dup_counts(docs, 0.9).collect()}
    assert out == {1: 0, 2: 0, 3: 3, 4: 0}


def test_containment_word_order_and_repeats_ignored(spark):
    # word SETS: order and multiplicity don't matter; both collapse to
    # {a, b}, sizes tie, so the higher id (2) is the contained side
    docs = _docs(spark, [(1, "b a a b"), (2, "a b")])
    out = {r["doc_id"]: r["n_containers"] for r in
           containment_dup_counts(docs, 0.9).collect()}
    assert out == {1: 0, 2: 1}


def _events(spark, rows):
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )
    return df


def test_rolling_range_sum_variable_width(spark):
    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)

    def at(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    # one user: events at 0, 30, 59, 61, 150 minutes; 60-min window
    df = _events(spark, [
        (1, at(0), 1.0),
        (1, at(30), 2.0),
        (1, at(59), 4.0),
        (1, at(61), 8.0),   # 0-min event falls OUT (61 > 60)
        (1, at(150), 16.0),  # alone
    ])
    out = rolling_range_agg(
        df, "user_id", "ts",
        aggs={"roll_sum": F.sum("value"), "roll_n": F.count(F.lit(1))},
        window_seconds=3600.0,
    )
    got = {r["value"]: (r["roll_sum"], r["roll_n"]) for r in out.collect()}
    assert got == {
        1.0: (1.0, 1),
        2.0: (3.0, 2),
        4.0: (7.0, 3),
        8.0: (14.0, 3),   # 30+59+61 in window; 0 dropped
        16.0: (16.0, 1),
    }


def test_rolling_range_ties_are_peers(spark):
    # ANSI RANGE frames: rows with equal ts see the IDENTICAL frame
    t0 = datetime.datetime(2026, 1, 1)
    df = _events(spark, [(1, t0, 1.0), (1, t0, 2.0)])
    out = rolling_range_agg(df, "user_id", "ts", window_seconds=60.0,
                            value_col="value", out_col="roll_sum")
    sums = sorted(r["roll_sum"] for r in out.collect())
    assert sums == [3.0, 3.0]


def test_rolling_range_partitions_independent(spark):
    t0 = datetime.datetime(2026, 1, 1)
    df = _events(spark, [(1, t0, 1.0), (2, t0, 5.0)])
    out = rolling_range_agg(df, "user_id", "ts", window_seconds=60.0)
    got = {r["user_id"]: r["rolling_sum"] for r in out.collect()}
    assert got == {1: 1.0, 2: 5.0}
