"""JSONL source/sink: declared-metadata reads, NULL/malformed handling,
round-trip with Oracle-format timestamps."""

import json

from haskell_dbfunctor_spark.sources.csv import TableMeta
from haskell_dbfunctor_spark.sources.jsonl import read_jsonl, write_jsonl

META = TableMeta(
    name="t",
    columns=[
        ("id", "Integer"),
        ("name", "Varchar"),
        ("score", "Double"),
        ("ts", "Timestamp DD/MM/YYYY HH24:MI:SS"),
    ],
    pk=["id"],
)


def _write_lines(path, lines):
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def test_read_jsonl_declared_schema(spark, tmp_path):
    p = str(tmp_path / "in.jsonl")
    _write_lines(p, [
        json.dumps({"id": 1, "name": "a", "score": 1.5,
                    "ts": "02/03/2024 10:20:30", "extra": "ignored"}),
        json.dumps({"id": 2, "name": None, "score": None}),  # missing ts
        json.dumps({"id": "oops", "name": "bad-int", "score": "x"}),
    ])
    rows = {r["name"]: r for r in read_jsonl(spark, p, META).collect()}
    a = rows["a"]
    assert a["id"] == 1 and abs(a["score"] - 1.5) < 1e-9
    assert (a["ts"].day, a["ts"].month, a["ts"].year) == (2, 3, 2024)
    none_row = rows[None]
    assert none_row["id"] == 2 and none_row["score"] is None
    assert none_row["ts"] is None
    bad = rows["bad-int"]
    assert bad["id"] is None and bad["score"] is None  # try_cast -> NULL


def test_jsonl_preserves_empty_string(spark, tmp_path):
    """JSON "" is a real value, distinct from null/missing — the CSV
    empty-cell convention must NOT apply here."""
    p = str(tmp_path / "in.jsonl")
    _write_lines(p, [
        json.dumps({"id": 1, "name": "", "score": 0.0,
                    "ts": "01/01/2024 00:00:00"}),
        json.dumps({"id": 2, "name": None, "score": 0.0,
                    "ts": "01/01/2024 00:00:00"}),
    ])
    rows = {r["id"]: r["name"] for r in read_jsonl(spark, p, META).collect()}
    assert rows[1] == "" and rows[2] is None


def test_jsonl_round_trip(spark, tmp_path):
    src = str(tmp_path / "src.jsonl")
    _write_lines(src, [
        json.dumps({"id": 7, "name": "x", "score": 2.25,
                    "ts": "31/12/2023 23:59:59"}),
    ])
    df = read_jsonl(spark, src, META)
    out = str(tmp_path / "out")
    write_jsonl(df, out, META, single_file=True)
    back = read_jsonl(spark, out, META).collect()
    assert len(back) == 1
    r = back[0]
    assert r["id"] == 7 and abs(r["score"] - 2.25) < 1e-9
    assert (r["ts"].year, r["ts"].second) == (2023, 59)
    # JSON keeps numerics as numbers, not %.2f strings
    raw = spark.read.json(out).collect()[0]
    assert isinstance(raw["score"], float)
    assert raw["ts"] == "31/12/2023 23:59:59"


def test_jsonl_column_subset_and_order_on_write(spark, tmp_path):
    src = str(tmp_path / "src.jsonl")
    _write_lines(src, [json.dumps(
        {"id": 1, "name": "n", "score": 0.5, "ts": "01/01/2024 00:00:00"}
    )])
    df = read_jsonl(spark, src, META)
    sub = TableMeta(name="t", columns=[("name", "Varchar"), ("id", "Integer")])
    out = str(tmp_path / "out2")
    write_jsonl(df, out, sub, single_file=True)
    back = spark.read.json(out)
    assert sorted(back.columns) == ["id", "name"]
