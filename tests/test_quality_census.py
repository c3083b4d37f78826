"""Data-quality census operators: FK integrity, freshness, profiling."""

import datetime

from pyspark.sql import Row, functions as F

from haskell_dbfunctor_spark.operators.quality import (
    fk_orphans,
    freshness_lag,
    profile_columns,
    referential_integrity_census,
)


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_fk_orphans_null_fk_passes(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, None), (4, 99)], "id int, fk int"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk int")
    got = {r.id for r in fk_orphans(child, parent, "fk", "pk").collect()}
    assert got == {4}  # NULL FK (id=3) is not a violation


def test_census_counts(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, None), (4, 99)], "id int, fk int"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk int")
    rows = referential_integrity_census(
        [("child_fk", child, "fk", parent, "pk")]
    ).collect()
    assert rows == [
        Row(constraint="child_fk", n_child=4, n_fk_non_null=3, n_orphans=1)
    ]


def test_census_multiple_constraints_unions(spark):
    a = spark.createDataFrame([(1, 1)], "id int, fk int")
    b = spark.createDataFrame([(1, 7)], "id int, fk int")
    p = spark.createDataFrame([(1,)], "pk int")
    out = referential_integrity_census(
        [("a_ok", a, "fk", p, "pk"), ("b_bad", b, "fk", p, "pk")]
    )
    got = {r.constraint: r.n_orphans for r in out.collect()}
    assert got == {"a_ok": 0, "b_bad": 1}


def test_freshness_lag(spark):
    df = spark.createDataFrame(
        [
            ("a", _ts("2026-01-01 00:00:00")),
            ("a", _ts("2026-01-01 01:00:00")),
            ("b", _ts("2026-01-01 00:30:00")),
        ],
        "src string, ts timestamp",
    )
    out = freshness_lag(df, "src", "ts", stale_after_minutes=15.0)
    got = {r.src: (r.lag_minutes, r.is_stale) for r in out.collect()}
    assert got["a"] == (0.0, False)
    assert got["b"] == (30.0, True)


def test_profile_columns_one_row_per_column(spark):
    df = spark.createDataFrame(
        [(1, "x", None), (2, "y", 5.0), (2, None, 7.5)],
        "k int, s string, v double",
    )
    out = {r.column: r for r in profile_columns(df).collect()}
    assert set(out) == {"k", "s", "v"}
    k = out["k"]
    assert (k.n_rows, k.n_nulls, k.n_distinct) == (3, 0, 2)
    assert (k.min_value, k.max_value) == ("1", "2")
    s = out["s"]
    assert (s.n_nulls, s.n_distinct, s.min_value, s.max_value) == (
        1, 2, "x", "y",
    )
    v = out["v"]
    assert abs(v.null_rate - 1.0 / 3.0) < 1e-12
    assert (v.min_value, v.max_value) == ("5.0", "7.5")


def test_profile_single_scan_plan(spark):
    """The profile is one aggregate over one scan — no per-column
    rescans (the Expand multi-distinct plan reads the input once)."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("m")
    )
    plan = profile_columns(df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("range (0, 100") == 1


def test_profile_approx_ndv_close(spark):
    df = spark.range(1000).select((F.col("id") % 123).alias("x"))
    row = profile_columns(df, approx_ndv=True).collect()[0]
    assert abs(row.n_distinct - 123) <= 10
