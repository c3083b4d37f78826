"""groupNoAgg family (mirrors /root/reference/test/DBFTests.hs:833-937:
group by Name+MyTime without aggregation) + the thin reference-surface
wrappers added in round 2 (concat_rtab, rtuple_map, insert_append,
nvl_table, decode_table, Pipeline.apply2, head/tail CSV)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
import pytest
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.operators import (
    concat_rtab, group_map, group_no_agg, group_no_agg_list,
    insert_append, rtuple_map, rtuple_map_with_key,
)
from haskell_dbfunctor_spark.functions import decode_table, nvl_table
from haskell_dbfunctor_spark.plans.pipeline import Pipeline


ROWS = [  # the DBFTests fixture shape: Name, MyTime, Number, DNumber
    ("Karagiannidis", "2018-01-01 10:00:00", 1, 1.5),
    ("Karagiannidis", "2018-01-01 10:00:00", 2, 2.5),
    ("Karagiannidis", "2018-06-01 10:00:00", 3, 3.5),
    ("Alex", "2018-01-01 10:00:00", 4, 4.5),
    ("Alex", "2018-01-01 10:00:00", 5, 5.5),
    ("Maria", "2018-06-01 10:00:00", 6, 6.5),
]
COLS = ["Name", "MyTime", "Number", "DNumber"]


@pytest.fixture()
def tab(spark):
    return spark.createDataFrame(ROWS, COLS)


def test_group_no_agg_retains_all_rows_clustered(tab):
    out = group_no_agg(tab, ["Name", "MyTime"])
    assert sorted(map(tuple, out.collect())) == sorted(ROWS)
    # groups are whole within partitions: every (Name, MyTime) key maps
    # to exactly one partition id
    pid = out.withColumn("pid", F.spark_partition_id())
    spread = (
        pid.groupBy("Name", "MyTime")
        .agg(F.count_distinct("pid").alias("n"))
        .agg(F.max("n"))
        .head()[0]
    )
    assert spread == 1


def test_group_no_agg_empty_and_no_cols(tab, spark):
    assert group_no_agg(tab.limit(0), ["Name"]).count() == 0
    assert group_no_agg(tab, []).count() == len(ROWS)  # identity


def test_group_no_agg_list_one_table_per_group(tab):
    groups = group_no_agg_list(tab, ["Name", "MyTime"])
    assert len(groups) == 4  # distinct (Name, MyTime) pairs
    sizes = sorted(g.count() for g in groups)
    assert sizes == [1, 1, 2, 2]
    # in total the initial set of rows is retained (reference contract)
    total = sorted(
        tuple(r) for g in groups for r in g.collect()
    )
    assert total == sorted(ROWS)


def test_group_no_agg_list_empty_input(tab):
    groups = group_no_agg_list(tab.limit(0), ["Name"])
    assert len(groups) == 1 and groups[0].count() == 0


def test_group_map_one_pass_per_group(tab):
    def rank_in_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("Number").reset_index(drop=True)
        pdf["rk"] = range(1, len(pdf) + 1)
        return pdf

    out = group_map(
        tab, ["Name", "MyTime"], rank_in_group,
        "Name string, MyTime string, Number long, DNumber double, rk long",
    )
    got = {(r["Name"], r["Number"]): r["rk"] for r in out.collect()}
    assert got[("Karagiannidis", 1)] == 1
    assert got[("Karagiannidis", 2)] == 2
    assert got[("Maria", 6)] == 1


def test_concat_rtab_unions_with_dedup(tab):
    a = tab.where(F.col("Name") == "Alex")
    b = tab.where(F.col("Name") == "Maria")
    out = concat_rtab(a, b, a)  # a twice: dedup collapses it
    assert out.count() == 3


def test_rtuple_map_applies_to_every_column(spark):
    df = spark.createDataFrame([(" a ", " b ")], ["x", "y"])
    out = rtuple_map(df, lambda c: F.trim(c)).head()
    assert (out["x"], out["y"]) == ("a", "b")
    out2 = rtuple_map_with_key(
        df, lambda name, c: F.upper(c) if name == "x" else c
    ).head()
    assert out2["x"] == " A "
    assert out2["y"] == " b "


def test_insert_append(tab):
    out = insert_append(tab, {"Name": "New", "Number": 7})
    assert out.count() == len(ROWS) + 1
    row = out.where(F.col("Name") == "New").head()
    assert row["Number"] == 7 and row["MyTime"] is None
    with pytest.raises(ValueError):
        insert_append(tab, {"NoSuchCol": 1})


def test_nvl_table_and_decode_table(spark):
    df = spark.createDataFrame(
        [("a", None), (None, "x"), ("keep", "y")], ["c1", "c2"]
    )
    filled = nvl_table(df, "~")
    assert [tuple(r) for r in filled.sort("c1").collect()] == [
        ("a", "~"), ("keep", "y"), ("~", "x")
    ]
    dec = decode_table(df, "x", "DECODED", cols=["c2"])
    got = {r["c1"]: r["c2"] for r in dec.collect()}
    assert got[None] == "DECODED" and got["keep"] == "y"


def test_pipeline_apply2_binary_op(tab):
    other = tab.where(F.col("Name") == "Maria").select("Name").distinct()
    p = (
        Pipeline(tab)
        .named("base")
        .apply2(other, lambda l, r: l.join(r, "Name", "left_semi"))
    )
    assert p.to_df().count() == 1
    # named-result operand form (Julius Previous/TabL analog)
    p2 = (
        Pipeline(tab.select("Name").distinct())
        .named("names")
        .filter(F.col("Name") != "Maria")
        .apply2("names", lambda l, r: r.subtract(l))
    )
    assert [r["Name"] for r in p2.to_df().collect()] == ["Maria"]


def test_head_tail_csv(spark, tmp_path):
    from haskell_dbfunctor_spark.sources.csv import head_csv, tail_csv

    df = spark.createDataFrame([(i,) for i in range(5)], ["v"])
    assert head_csv(df) is not None
    t = tail_csv(df)
    assert t.count() == 4
