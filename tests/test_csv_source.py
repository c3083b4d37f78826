"""CSV source/sink semantics vs the reference's test fixture shape
(test/DBFTests.hs:47-75: ;-delimited, UTF-8 names, missing values ->
NULL, Oracle-format dates/timestamps, declared schema)."""

import pytest

from haskell_dbfunctor_spark.sources import CSVOptions, TableMeta, read_csv, write_csv

FIXTURE = """Name;Date;Time;Num;DNum
alpha;1/12/1991;02/12/1994 12:30:55;1;0.5
Βήτα;02/12/1994;02/12/1994 12:30:55;2;2.5
gamma;;;;
δέλτα;15/06/2020;15/06/2020 23:59:59;-7;1234.567
alpha;1/12/1991;02/12/1994 12:30:55;1;0.5
"""

META = TableMeta(
    name="test_options",
    columns=[
        ("Name", "Varchar"),
        ("Date", "Date DD/MM/YYYY"),
        ("Time", "Timestamp DD/MM/YYYY HH24:MI:SS"),
        ("Num", "Integer"),
        ("DNum", "Double"),
    ],
)


@pytest.fixture()
def csv_path(tmp_path):
    p = tmp_path / "fixture.csv"
    p.write_text(FIXTURE, encoding="utf-8")
    return str(p)


def test_read_declared_schema(spark, csv_path):
    df = read_csv(spark, csv_path, META, CSVOptions(delimiter=";"))
    assert [f.name for f in df.schema.fields] == META.col_names()
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "string", "date", "timestamp", "bigint", "double",
    ]
    rows = {r.Name: r for r in df.collect()}
    assert rows["Βήτα"].Num == 2  # UTF-8 name survives
    # empty strings -> NULL across all types (CSV.hs:342-344)
    g = rows["gamma"]
    assert g.Date is None and g.Time is None and g.Num is None and g.DNum is None
    # lenient single-digit day parses (reference toRTimestamp leniency)
    assert str(rows["alpha"].Date) == "1991-12-01"
    assert rows["δέλτα"].Num == -7
    # duplicate rows preserved (bag semantics)
    assert df.count() == 5


def test_round_trip(spark, csv_path, tmp_path):
    df = read_csv(spark, csv_path, META, CSVOptions(delimiter=";"))
    out_dir = str(tmp_path / "out")
    write_csv(df, out_dir, META, CSVOptions(delimiter=";"), single_file=True)
    back = read_csv(
        spark, out_dir, TableMeta(
            name="t2",
            columns=[
                ("Name", "Varchar"),
                ("Date", "Varchar"),
                ("Time", "Timestamp DD/MM/YYYY HH24:MI:SS"),
                ("Num", "Integer"),
                ("DNum", "Double"),
            ],
        ), CSVOptions(delimiter=";"),
    )
    rows = {r.Name: r for r in back.collect()}
    # doubles re-serialized %.2f (CSV.hs:430)
    assert rows["δέλτα"].DNum == 1234.57
    assert rows["gamma"].Num is None


def test_metadata_column_subset_on_write(spark, csv_path, tmp_path):
    df = read_csv(spark, csv_path, META, CSVOptions(delimiter=";"))
    sub = TableMeta(name="sub", columns=[("Name", "Varchar"), ("Num", "Integer")])
    out_dir = str(tmp_path / "sub")
    write_csv(df, out_dir, sub, single_file=True)
    back = spark.read.option("header", "true").csv(out_dir)
    assert back.columns == ["Name", "Num"]


def test_too_few_file_columns_raises(spark, tmp_path):
    p = tmp_path / "narrow.csv"
    p.write_text("a;b\n1;2\n", encoding="utf-8")
    with pytest.raises(ValueError, match="metadata declares"):
        read_csv(spark, str(p), META, CSVOptions(delimiter=";"))


def test_print_rtable_formats(spark, capsys):
    from haskell_dbfunctor_spark.sources.csv import (
        TableMeta, print_rtable, printf_rtable,
    )

    df = spark.createDataFrame([(1.5, "x")], ["d", "s"])
    meta = TableMeta("T", [("d", "Double"), ("s", "Varchar")])
    print_rtable(df)
    printf_rtable(df, meta)
    out = capsys.readouterr().out
    assert "1.50" in out  # %.2f double formatting (CSV.hs:430)
    assert "x" in out


def test_copy_csv(spark, csv_path, tmp_path):
    # copyCSV (CSV.hs:302-309): readCSV >> writeCSV round trip
    from haskell_dbfunctor_spark.sources import copy_csv

    dst = str(tmp_path / "copied")
    copy_csv(spark, csv_path, dst, CSVOptions(delimiter=";"))
    back = read_csv(spark, dst, META, CSVOptions(delimiter=";"))
    orig = read_csv(spark, csv_path, META, CSVOptions(delimiter=";"))
    assert back.count() == orig.count()
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, orig.collect())
    )
