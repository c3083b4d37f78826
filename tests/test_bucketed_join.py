"""Bucketed co-located joins: the join over two same-bucketed tables
must plan with ZERO Exchange (no shuffle at all) and agree with the
plain shuffled join."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import re

from pyspark.sql import functions as F

from haskell_dbfunctor_spark.operators.bucketed import (
    colocated_join,
    write_bucketed_table,
)


def _exchanges(df) -> int:
    """Any data movement: shuffle (Exchange hashpartitioning) OR
    broadcast (BroadcastExchange)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"Exchange", plan))


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    # the in-memory catalog forgets tables across sessions but the
    # warehouse dirs survive — clear both sides first
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("bt_customer", "bt_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)

    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").alias("c_custkey"), "o_totalprice"
    )
    write_bucketed_table(c, "bt_customer", ["c_custkey"], 8)
    write_bucketed_table(o, "bt_orders", ["c_custkey"], 8)

    j = colocated_join(
        spark, "bt_customer", "bt_orders", ["c_custkey"],
        force_sort_merge=True,  # both sides "large": the 100 TB shape
    )
    assert _exchanges(j) == 0, "bucketed join still shuffles"

    # contrast: the same join over unbucketed frames moves data (the
    # merge hint pins SMJ so AQE can't hide the movement as a
    # broadcast — either way it is an Exchange; the bucketed plan has
    # NONE of any kind)
    plain = c.hint("merge").join(o, "c_custkey")
    assert _exchanges(plain) > 0
    got = j.groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("s")
    ).head()
    want = plain.groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("s")
    ).head()
    assert (got["n"], got["s"]) == (want["n"], want["s"])

    # aggregation over the bucket key is also exchange-free
    agg = spark.table("bt_orders").groupBy("c_custkey").count()
    assert _exchanges(agg) == 0
