"""frequent_items (operators/sketch.py): the Misra–Gries candidate pass
+ exact verify must EQUAL the full groupBy HAVING answer — on skewed,
uniform, and adversarial (capacity ≪ distinct) inputs."""

import random

import pytest
from pyspark.sql import Row, functions as F

from haskell_dbfunctor_spark.operators.sketch import (
    _mg_candidates, frequent_items,
)


def _exact_hh(df, col, k):
    items = df.select(col).where(F.col(col).isNotNull())
    n = items.count()
    return {
        (r[col], r["cnt"])
        for r in items.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") * k > F.lit(n)).collect()
    }


def _hh(df, col, k, **kw):
    return {(r[col], r["cnt"])
            for r in frequent_items(df, col, k, **kw).collect()}


def test_zipf_matches_exact(spark):
    rng = random.Random(7)
    # Zipf-ish: item i drawn with weight 1/(i+1)
    pop = [f"w{i}" for i in range(400)]
    wts = [1.0 / (i + 1) for i in range(400)]
    rows = rng.choices(pop, weights=wts, k=20_000)
    df = spark.createDataFrame([Row(item=v) for v in rows]).repartition(8)
    for k in (10, 50, 200):
        assert _hh(df, "item", k) == _exact_hh(df, "item", k)


def test_capacity_below_distinct_still_exact(spark):
    # 5000 distinct, capacity 20 ≪ distinct: the sketch evicts
    # constantly, but every item above n/k must still surface
    rng = random.Random(11)
    rows = ["hot"] * 3000 + ["warm"] * 800 + [
        f"cold{rng.randrange(5000)}" for _ in range(6000)
    ]
    rng.shuffle(rows)
    df = spark.createDataFrame([Row(item=v) for v in rows]).repartition(16)
    got = _hh(df, "item", 20, capacity=20)
    assert got == _exact_hh(df, "item", 20)
    assert ("hot", 3000) in got


def test_uniform_no_heavy_hitters(spark):
    df = spark.range(0, 4096).select(
        (F.col("id") % 512).cast("string").alias("item")
    )
    assert _hh(df, "item", 64) == set()  # every count == n/512 ≤ n/64


def test_nulls_ignored_and_threshold_strict(spark):
    df = spark.createDataFrame(
        [Row(item="a")] * 30 + [Row(item="b")] * 10 + [Row(item=None)] * 60
    )
    # n counts non-NULL rows only (40): a=30 > 40/2, b=10 NOT > 40/4=10
    assert _hh(df, "item", 2) == {("a", 30)}
    assert _hh(df, "item", 4) == {("a", 30)}  # strict >: b excluded


def test_candidate_superset_guarantee(spark):
    # direct check of the pass-1 contract: candidates ⊇ items with
    # count > n/(capacity+1), even with pathological batch ordering
    rows = ["x"] * 900 + [f"junk{i}" for i in range(900)]
    df = spark.createDataFrame([Row(item=v) for v in rows]).coalesce(1)
    cands = {r["item"] for r in _mg_candidates(df, "item", 8).collect()}
    assert "x" in cands
    assert len(cands) <= 8


def test_capacity_below_k_rejected(spark):
    df = spark.createDataFrame([Row(item="a")])
    with pytest.raises(ValueError):
        frequent_items(df, "item", 10, capacity=5)


def test_non_string_items(spark):
    df = spark.range(0, 1000).select(
        F.when(F.col("id") % 3 == 0, F.lit(7)).otherwise(F.col("id"))
        .alias("item")
    )
    got = _hh(df, "item", 10)
    assert got == _exact_hh(df, "item", 10)
    assert any(v == 7 for v, _ in got)
