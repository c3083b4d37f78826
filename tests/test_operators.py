"""Operator-kernel semantics tests, modeled on the reference's test
strategy (SURVEY.md §5): each operator checked against an independent
DuckDB oracle or a hand-computed expectation, including the
reference's semantic edge cases (NULL ordering, all-NULL aggregates,
join collision renames, upsert legs, column-mapping shapes).
Fixture mirrors the reference's test_options.csv shape (FIXTURES.md F3).
"""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F, types as T

from haskell_dbfunctor_spark.operators import (
    Avg, Count, CountDist, CountStar, Max, Min, StrAgg, Sum,
    add_column, agg, anti_join, col_mapping, delete_rows,
    full_outer_join, group_by, inner_join, intersect, left_join, minus,
    order_by, project, project_missed_hits, remove_column, rfilter,
    right_join, running_total, semi_join, surrogate_key, union,
    union_all, update_rows, upsert,
)
from haskell_dbfunctor_spark.operators.core import UniquenessViolationInUpsert
from haskell_dbfunctor_spark.functions import (
    decode, instr0, nvl, oracle_fmt_to_spark, to_rtimestamp,
)

SCHEMA = T.StructType([
    T.StructField("Name", T.StringType()),
    T.StructField("Number", T.LongType()),
    T.StructField("DNumber", T.DoubleType()),
])

ROWS = [
    ("Karagiannidis", 240, None),
    ("Καραγιαννίδης", 10, 2.3),
    ("Karagiannidis", 240, None),   # duplicate row
    ("Nkarag", None, None),
    (None, 2412, 0.5),
    ("Zeta", 10, None),
]


@pytest.fixture(scope="module")
def rt(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    df.persist().count()
    return df


@pytest.fixture(scope="module")
def rt_pdf(rt):
    return rt.toPandas()


def _oracle(pdf_map: dict, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for name, pdf in pdf_map.items():
        con.register(name, pdf)
    return con.execute(sql).df()


def _norm(v) -> str:
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return f"{float(v):.6f}"
    return str(v)


def _rows(pdf: pd.DataFrame) -> list[str]:
    vals = pdf.where(pd.notna(pdf), "∅").values.tolist()
    return sorted(str(tuple(_norm(v) for v in r)) for r in vals)


# ---------------------------------------------------------------- π/σ

def test_filter_project(rt, rt_pdf):
    got = project(rfilter(rt, F.col("Number") > 10), ["Name", "Number"]).toPandas()
    want = _oracle({"t": rt_pdf}, "SELECT Name, Number FROM t WHERE Number > 10")
    assert _rows(got) == _rows(want)


def test_filter_null_comparison_is_false(rt):
    # Null == x is False (Core.hs:802-824): filter keeps nothing for NULLs
    assert rfilter(rt, F.col("Number") == 2412).count() == 1
    assert rfilter(rt, F.col("Number") != 2412).count() == 4  # NULL row excluded


def test_project_missed_hits(rt):
    out = project_missed_hits(rt, ["Name", "Ghost"])
    assert out.columns == ["Name", "Ghost"]
    assert out.where(F.col("Ghost").isNull()).count() == out.count()


def test_add_remove_column(rt):
    out = add_column(rt, "Flag", 1)
    assert out.where(F.col("Flag") == 1).count() == rt.count()
    assert remove_column(out, "Flag").columns == rt.columns
    assert remove_column(rt, "NotThere").columns == rt.columns  # no-op


# -------------------------------------------------------------- joins

def test_inner_join_collision_suffix(rt):
    out = inner_join(rt, rt, ["Name"])
    # right side columns renamed with _1 (joinRTuples convention)
    assert out.columns == ["Name", "Number", "DNumber", "Name_1", "Number_1", "DNumber_1"]
    # NULL keys never match (reference Eq)
    assert out.where(F.col("Name").isNull()).count() == 0


def test_join_flavors_match_duckdb(rt, rt_pdf):
    l = rt.select("Name", "Number")
    r = rt.select(F.col("Name").alias("RName"), F.col("DNumber").alias("RD")).where(
        F.col("RD").isNotNull()
    )
    on = lambda a, b: a["Name"] == b["RName"]  # noqa: E731
    cases = {
        "inner": (inner_join, "JOIN"),
        "left": (left_join, "LEFT JOIN"),
        "right": (right_join, "RIGHT JOIN"),
        "full": (full_outer_join, "FULL JOIN"),
    }
    for name, (fn, kw) in cases.items():
        got = fn(l, r, on).toPandas()
        want = _oracle(
            {"t": rt_pdf},
            f"""SELECT l.Name, l.Number, r.RName, r.RD
                FROM (SELECT Name, Number FROM t) l
                {kw} (SELECT Name AS RName, DNumber AS RD FROM t
                      WHERE DNumber IS NOT NULL) r
                ON l.Name = r.RName""",
        )
        assert len(got) == len(want), name
        assert _rows(got) == _rows(want), name


def test_semi_anti(rt):
    small = rt.where(F.col("Number") == 10).select("Name")
    assert semi_join(rt, small, ["Name"]).count() == 2
    assert anti_join(rt, small, ["Name"]).count() == 4
    assert semi_join(rt, small, ["Name"]).columns == rt.columns


def test_theta_join(rt):
    # arbitrary theta predicate (RJoinPredicate, Core.hs:1953)
    out = inner_join(
        rt.where(F.col("Number").isNotNull()),
        rt.where(F.col("Number").isNotNull()),
        lambda a, b: a["Number"] < b["Number"],
    )
    # pairs with strictly smaller Number: 10<240 (2*2*2=wait) compute via pandas
    pdf = rt.toPandas().dropna(subset=["Number"])
    want = sum(
        (x < y) for x in pdf["Number"] for y in pdf["Number"]
    )
    assert out.count() == want


# ------------------------------------------------------------ set ops

def test_set_ops(rt, rt_pdf):
    a = rt.where(F.col("Number") >= 10)
    b = rt.where(F.col("Number") <= 240)
    for fn, kw in [(union, "UNION"), (intersect, "INTERSECT"), (minus, "EXCEPT")]:
        got = fn(a, b).toPandas()
        want = _oracle(
            {"t": rt_pdf},
            f"SELECT * FROM t WHERE Number >= 10 {kw} SELECT * FROM t WHERE Number <= 240",
        )
        assert len(got) == len(want), kw
    assert union_all(a, b).count() == a.count() + b.count()


def test_union_keep_left_dups(spark):
    # Data.List.union parity (Core.hs:3004-3005): left dups preserved,
    # right appended nub-ed and only if absent from the left
    from haskell_dbfunctor_spark.operators import union_keep_left_dups

    l = spark.createDataFrame(
        [("a", 1), ("a", 1), ("b", 2)], "k string, v int"
    )
    r = spark.createDataFrame(
        [("a", 1), ("c", 3), ("c", 3), ("d", 4)], "k string, v int"
    )
    got = sorted(map(tuple, union_keep_left_dups(l, r).collect()))
    assert got == [("a", 1), ("a", 1), ("b", 2), ("c", 3), ("d", 4)]


def test_minus_null_aware(spark):
    # NULL = NULL for set membership (areTheyEqual, Core.hs:3204-3228)
    a = spark.createDataFrame([(None, 1), ("x", 2)], "k string, v int")
    b = spark.createDataFrame([(None, 1)], "k string, v int")
    out = minus(a, b).collect()
    assert len(out) == 1 and out[0]["k"] == "x"


# ------------------------------------------------------------ orderby

def test_order_by_null_placement(rt):
    # NULLS LAST on ASC, NULLS FIRST on DESC (runOrderBy, Core.hs:3266-3349)
    asc = order_by(rt, [("Number", "asc"), ("Name", "asc")]).collect()
    assert asc[-1]["Number"] is None
    desc = order_by(rt, [("Number", "desc")]).collect()
    assert desc[0]["Number"] is None


# --------------------------------------------------------------- aggs

def test_aggregates_with_nulls(rt):
    row = agg(
        rt,
        [
            Sum("Number", "s"), Count("Number", "c"), CountStar("cs"),
            CountDist("Number", "cd"), Avg("Number", "a"),
            Max("Name", "mx"), Min("Number", "mn"),
        ],
    ).collect()[0]
    assert row["s"] == 240 + 10 + 240 + 2412 + 10
    assert row["c"] == 5          # NULLs ignored
    assert row["cs"] == 6
    assert row["cd"] == 3
    assert row["mn"] == 10
    assert row["mx"] == "Καραγιαννίδης"  # Ord works on text (Core.hs:2204)


def test_all_null_agg_is_null_except_count(spark):
    df = spark.createDataFrame([(None,), (None,)], T.StructType([T.StructField("x", T.DoubleType())]))
    row = agg(df, [Sum("x", "s"), Avg("x", "a"), Count("x", "c")]).collect()[0]
    assert row["s"] is None and row["a"] is None
    assert row["c"] == 0  # documented divergence: reference yields Null


def test_group_by_and_str_agg(rt, rt_pdf):
    got = group_by(
        rt, ["Number"],
        [CountStar("n"), StrAgg("Name", "names", delim="|")],
    ).toPandas()
    want = _oracle(
        {"t": rt_pdf},
        """SELECT Number, count(*) AS n,
                  string_agg(Name, '|' ORDER BY Name) AS names
           FROM t GROUP BY Number""",
    )
    g = got.sort_values("Number", na_position="last").reset_index(drop=True)
    w = want.sort_values("Number", na_position="last").reset_index(drop=True)
    assert g["n"].tolist() == w["n"].tolist()
    # string_agg over NULL names: concat_ws skips nulls, duckdb too
    assert g["names"].fillna("").tolist() == w["names"].fillna("").tolist()


def test_generic_agg_vectorized(rt):
    # custom UDAF surface (raggGenericAgg, Core.hs:2001-2010) via
    # Arrow GROUPED_AGG — e.g. sum of squares
    import pandas as pd
    from haskell_dbfunctor_spark.operators import GenAgg

    def sumsq(v: pd.Series) -> float:
        return float((v.dropna() ** 2).sum())

    row = group_by(rt, [], [GenAgg("Number", "ssq", sumsq)])
    got = agg(rt, [GenAgg("Number", "ssq", sumsq)]).collect()[0]
    assert got["ssq"] == float(240**2 + 10**2 + 240**2 + 2412**2 + 10**2)


# ------------------------------------------------------------- window

def test_running_total(spark):
    # reference example2.hs:38-83 (monthly running total)
    months = [(f"2018{m:02d}", 50.0 + m) for m in range(1, 13)]
    df = spark.createDataFrame(months, ["Month", "Amount"])
    out = running_total(df, "Amount", ["Month"], "AccumAmount")
    rows = out.orderBy("Month").collect()
    acc = 0.0
    for r in rows:
        acc += r["Amount"]
        assert abs(r["AccumAmount"] - acc) < 1e-9


def test_surrogate_key(rt):
    out = surrogate_key(rt.where(F.col("Name").isNotNull()), "sk", ["Name"], init=100)
    vals = [r["sk"] for r in out.orderBy("sk").collect()]
    assert vals == list(range(100, 105))


# ---------------------------------------------------------------- DML

def test_update_delete(rt):
    upd = update_rows(rt, {"Number": 0}, F.col("Name") == "Zeta")
    assert upd.where(F.col("Number") == 0).count() == 1
    # delete keeps NULL-predicate rows (reference three-valued logic)
    dele = delete_rows(rt, F.col("Number") == 10)
    assert dele.count() == 4
    assert dele.where(F.col("Number").isNull()).count() == 1


def test_upsert_reference_semantics(spark):
    # worked example shape from Julius.hs:719-763
    trg = spark.createDataFrame(
        [("a", 1, "old"), ("b", 2, "old"), ("c", 3, "old")], ["k", "v", "tag"]
    )
    src = spark.createDataFrame(
        [("a", 10, "new"), ("d", 40, "new")], ["k", "v", "tag"]
    )
    out = upsert(trg, src, ["k"], update_cols=["v"]).toPandas().set_index("k")
    assert len(out) == 4
    assert out.loc["a", "v"] == 10 and out.loc["a", "tag"] == "old"  # subset update
    assert out.loc["b", "v"] == 2
    assert out.loc["d", "v"] == 40 and out.loc["d", "tag"] == "new"  # insert full row

    # matched_filter: only rows passing it get updated (T3 untouched)
    out2 = upsert(
        trg, src, ["k"], update_cols=["v"], matched_filter=F.col("__t.v") > 1
    ).toPandas().set_index("k")
    assert out2.loc["a", "v"] == 1  # vetoed by filter

    # uniqueness violation raises (Core.hs:3700-3708) — by default for
    # subset-update style (update_cols given), or when explicitly asked
    dup_src = spark.createDataFrame([("a", 1, "x"), ("a", 2, "y")], ["k", "v", "tag"])
    with pytest.raises(UniquenessViolationInUpsert):
        upsert(trg, dup_src, ["k"], update_cols=["v"])
    with pytest.raises(UniquenessViolationInUpsert):
        upsert(trg, dup_src, ["k"], check_unique=True)
    # full-row CDC style (update_cols=None) skips the eager extra scan:
    # callers dedupe upstream (LWW); construction must not raise
    upsert(trg, dup_src, ["k"])


def test_upsert_null_keyed_target_passthrough(spark):
    # A NULL-keyed TARGET row matches nothing (reference NULL equality,
    # Core.hs:802-824) and must survive as T2 with its payload intact.
    # Regression: presence derived from key[0].isNotNull classified it
    # as an S1 insert and nulled every non-key column.
    trg = spark.createDataFrame(
        [("a", 1, "old"), (None, 99, "keepme")], ["k", "v", "tag"]
    )
    src = spark.createDataFrame([("a", 10, "new")], ["k", "v", "tag"])
    out = upsert(trg, src, ["k"], update_cols=["v"]).toPandas()
    assert len(out) == 2
    nullrow = out[out["k"].isna()].iloc[0]
    assert nullrow["v"] == 99 and nullrow["tag"] == "keepme"
    arow = out[out["k"] == "a"].iloc[0]
    assert arow["v"] == 10 and arow["tag"] == "old"

    # symmetric: a NULL-keyed SOURCE row matches nothing → S1 insert
    src2 = spark.createDataFrame(
        [(None, 7, "ins")], "k string, v bigint, tag string"
    )
    out2 = upsert(trg, src2, ["k"], update_cols=["v"]).toPandas()
    assert len(out2) == 3
    assert (out2["k"].isna().sum()) == 2
    assert set(out2[out2["k"].isna()]["tag"]) == {"keepme", "ins"}


# ------------------------------------------------------ column mapping

def test_col_mapping_shapes(rt):
    # 1x1 native
    out = col_mapping(rt, ["Name"], ["UName"], exprs=[F.upper(F.col("Name"))])
    assert "UName" in out.columns
    # Nx1 vectorized pandas UDF
    import pandas as pd

    out = col_mapping(
        rt, ["Number", "DNumber"], ["total"],
        fn=lambda a, b: a.fillna(0) + b.fillna(0),
        return_types=["double"],
    )
    got = {r["Name"]: r["total"] for r in out.collect()}
    assert got["Καραγιαννίδης"] == pytest.approx(12.3)
    # 1xN vectorized (struct expansion), remove_src
    def split(name: pd.Series):
        return pd.DataFrame({"head": name.str.slice(0, 4), "len": name.str.len()})

    out = col_mapping(
        rt, ["Name"], ["head", "len"], fn=split,
        return_types=["string", "int"], remove_src=True,
    )
    assert "Name" not in out.columns and {"head", "len"} <= set(out.columns)
    # same-name target overwrites source; embedded filter drops rows
    out = col_mapping(
        rt, ["Number"], ["Number"],
        exprs=[F.col("Number") * 2],
        where=F.col("Number").isNotNull(),
    )
    assert out.count() == 5
    assert {r["Number"] for r in out.collect()} == {480, 20, 4824}


# ------------------------------------------------------------- scalar

def test_scalar_functions(rt, spark):
    row = rt.select(
        nvl(F.col("Number"), -1).alias("n"),
        decode(F.col("Name"), "Zeta", "Z", None, "NULLNAME", default="other").alias("d"),
        instr0(F.col("Name"), "arag").alias("pos"),
    ).where(F.col("d") == "NULLNAME").collect()
    assert row[0]["n"] == 2412 and row[0]["pos"] is None

    assert oracle_fmt_to_spark("DD/MM/YYYY HH24:MI:SS") == "dd/MM/yyyy HH:mm:ss"
    got = spark.range(1).select(
        to_rtimestamp(F.lit("25/12/1991 13:45:02"), "DD/MM/YYYY HH24:MI:SS").alias("t")
    ).collect()[0]["t"]
    assert (got.year, got.month, got.day, got.hour, got.minute, got.second) == (
        1991, 12, 25, 13, 45, 2,
    )


def test_pipeline_chain(rt):
    from haskell_dbfunctor_spark.plans import Pipeline

    p = (
        Pipeline(rt)
        .filter(F.col("Number").isNotNull())
        .counted("after_filter")
        .group_by(["Number"], [CountStar("n")])
        .order_by(("Number", "asc"))
    )
    rows = p.to_df().collect()
    assert [r["Number"] for r in rows] == [10, 240, 2412]
    assert p.counts()["after_filter"] == 5


def test_salted_equi_join_fallbacks(spark):
    """ADVICE regression: a left frame carrying ONLY the join column
    must not call xxhash64() with zero args (salt falls back to a
    per-row id hash), and results must equal a plain join either way."""
    from haskell_dbfunctor_spark.operators.skew import salted_equi_join

    left = spark.range(0, 200).select((F.col("id") % 3).alias("k"))
    right = spark.range(0, 3).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    out = salted_equi_join(left, right, "k", salt=8)
    plain = left.join(right, "k")
    assert out.count() == plain.count() == 200
    assert sorted(
        (r.k, r.v) for r in out.groupBy("k", "v").count().collect()
    ) == sorted((r.k, r.v) for r in plain.groupBy("k", "v").count().collect())
    # salt_by with real columns still matches the plain join
    left2 = spark.range(0, 100).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("payload")
    )
    out2 = salted_equi_join(left2, right, "k", salt=8, salt_by=["payload"])
    assert out2.count() == 100


def test_group_by_rollup_and_cube(spark):
    from haskell_dbfunctor_spark.operators import (
        CountStar, group_by_rollup,
    )

    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 3)],
        "g1 string, g2 string, v long",
    )
    roll = {
        (r.g1, r.g2, r.gid): r.n
        for r in group_by_rollup(
            df, ["g1", "g2"], [CountStar("n")], grouping_id_as="gid"
        ).collect()
    }
    # 3 leaf rows + 2 g1 subtotals + 1 grand total
    assert roll[("a", "x", 0)] == 1
    assert roll[("a", None, 1)] == 2
    assert roll[(None, None, 3)] == 3
    cube = group_by_rollup(
        df, ["g1", "g2"], [CountStar("n")], cube=True
    ).collect()
    # cube adds the g2-only level: 3 + 2 + 1 + 2 = 8 rows
    assert len(cube) == 8


def test_pivot_table_explicit_values(spark):
    from haskell_dbfunctor_spark.operators import Sum, pivot_table

    df = spark.createDataFrame(
        [(1, "a", 2.0), (1, "b", 3.0), (2, "a", 5.0)],
        "k long, t string, v double",
    )
    out = {
        r.k: r
        for r in pivot_table(
            df, ["k"], "t", ["a", "b", "zzz"], Sum("v", "s")
        ).collect()
    }
    assert out[1].a == 2.0 and out[1].b == 3.0 and out[1].zzz is None
    assert out[2].a == 5.0 and out[2].b is None
