"""Dual-path equivalence — the reference's key test idea
(test/DBFTests.hs: every operation computed via raw RTable.Core AND the
Julius expression, outputs diffed). Here: direct operator composition
vs the Pipeline chain over the same inputs must agree row-for-row.
"""

from pyspark.sql import functions as F

from haskell_dbfunctor_spark.operators import (
    CountStar, Sum, group_by, inner_join, order_by, project, rfilter,
)
from haskell_dbfunctor_spark.plans.pipeline import Pipeline


def _rows(df):
    return sorted(map(str, df.collect()))


def test_filter_project_join_group_dual_path(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")

    direct = group_by(
        inner_join(
            rfilter(orders, F.col("o_totalprice") > 100.0),
            cust,
            lambda l, r: l["o_custkey"] == r["c_custkey"],
        ),
        ["c_mktsegment"],
        [Sum("o_totalprice", "rev"), CountStar("n")],
    )

    piped = (
        Pipeline(orders)
        .filter(F.col("o_totalprice") > 100.0)
        .join(cust, lambda l, r: l["o_custkey"] == r["c_custkey"])
        .group_by(["c_mktsegment"], [Sum("o_totalprice", "rev"), CountStar("n")])
        .to_df()
    )
    assert _rows(direct) == _rows(piped)


def test_named_result_and_counted_metrics(spark, sf_dir):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    p = (
        Pipeline(nation)
        .filter(F.col("n_regionkey") < 3)
        .counted("after_filter")
        .named("filtered")
        .select("n_nationkey", "n_name")
    )
    out = p.to_df()
    n_out = out.count()
    # RTabResult analog: the observation reports the step's row count
    assert p.counts()["after_filter"] == n_out
    # takeNamedResult analog: the named intermediate is reusable
    assert p.result("filtered").count() == n_out


def test_order_by_dual_path_null_placement(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", F.nullif(F.col("l_discount"), F.lit(0.0)).alias("d")
    ).limit(200)
    direct = order_by(li, [("d", "asc"), ("l_orderkey", "asc")])
    piped = Pipeline(li).order_by(("d", "asc"), ("l_orderkey", "asc")).to_df()
    # NULLS LAST on asc (reference runOrderBy, Core.hs:3266-3349)
    d_direct = [r.d for r in direct.collect()]
    assert d_direct == [r.d for r in piped.collect()]
    non_null = [x for x in d_direct if x is not None]
    assert d_direct[: len(non_null)] == non_null  # nulls at the end


def test_run_either_captures_failure_as_value(spark):
    # eitherRunJulius parity (Julius.hs:1194-1222): Either, not raise
    from pyspark.sql import functions as F

    from haskell_dbfunctor_spark.plans.pipeline import Pipeline

    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    ok, err = Pipeline(df).filter(F.col("k") > 1).run_either(
        lambda d: d.count()
    )
    assert ok == 1 and err is None
    # default action: driver-safe noop materialization, True on success
    ok2, err2 = Pipeline(df).run_either()
    assert ok2 is True and err2 is None
    # a failing run comes back as a value, not a raise (analysis
    # errors surface at chain-BUILD time in Spark, so the Either
    # captures the run/action failure — e.g. a bad action or a
    # runtime error like a cast overflow under ANSI)
    out, err = Pipeline(df).run_either(lambda d: d.select("nope").count())
    assert out is None and err is not None
