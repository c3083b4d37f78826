"""lake/iceberg.py — the Iceberg-catalog deployment path.

The LWW dedup subquery is plain ANSI SQL: it is executed on DuckDB and
compared bit-for-bit against the engine's hash-agg dedup (the two
implementations of the same contract). The MERGE statement itself is
structurally checked (this sandbox has no engine that parses MERGE),
and its semantics are the ones LakeTable.merge's e2e tests pin."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.lake.iceberg import (
    create_table_ddl,
    dedup_subquery,
    full_merge_statement,
)

ROWS = [  # (k, v, ts, seq, op) with in-batch duplicates per key
    (1, "a1", 10, 1, "U"),
    (1, "a2", 20, 2, "U"),   # winner for k=1
    (2, "b1", 10, 3, "U"),
    (2, "b2", 10, 4, "D"),   # ts tie -> seq breaks: delete wins
    (3, "c1", 5, 5, "I"),
]


def test_dedup_subquery_matches_engine_lww(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE changes(k INT, v TEXT, ts INT, seq INT, op TEXT)")
    con.executemany("INSERT INTO changes VALUES (?,?,?,?,?)", ROWS)
    sql = dedup_subquery(
        "changes", ["k"], ["v", "ts", "seq"], op_col="op",
        order_cols=("ts", "seq"),
    )
    duck = {
        r[0]: r[1:] for r in con.execute(
            sql + " ORDER BY k"
        ).fetchall()
    }

    df = spark.createDataFrame(ROWS, "k int, v string, ts int, seq int, op string")
    ords = F.struct("ts", "seq")
    eng = {
        r["k"]: (r["v"], r["ts"], r["seq"], r["op"])
        for r in df.groupBy("k").agg(
            *[F.max_by(c, ords).alias(c) for c in ("v", "ts", "seq", "op")]
        ).collect()
    }
    assert duck == eng
    assert eng[1] == ("a2", 20, 2, "U")
    assert eng[2][3] == "D"  # seq tiebreak on equal ts


def test_full_merge_statement_structure():
    sql = full_merge_statement(
        "lake.transcripts", "updates",
        key_cols=["conv_id", "turn_idx"],
        payload_cols=["role", "text", "ts"],
        update_cols=["text", "ts"],
        matched_filter_sql="t.ts <= s.ts",
    )
    assert sql.startswith("MERGE INTO lake.transcripts t")
    assert "ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx" in sql
    assert "WHEN MATCHED AND s.op = 'D' THEN DELETE" in sql
    assert ("WHEN MATCHED AND s.op <> 'D' AND (t.ts <= s.ts) "
            "THEN UPDATE SET t.text = s.text, t.ts = s.ts") in sql
    assert ("WHEN NOT MATCHED AND s.op <> 'D' THEN INSERT "
            "(conv_id, turn_idx, role, text, ts) VALUES "
            "(s.conv_id, s.turn_idx, s.role, s.text, s.ts)") in sql
    assert "row_number() OVER (PARTITION BY conv_id, turn_idx" in sql
    # pure-upsert feed: no delete leg, no op predicates
    sql2 = full_merge_statement(
        "t2", "s2", key_cols=["k"], payload_cols=["v"], op_col=None,
        dedup=False,
    )
    assert "DELETE" not in sql2 and "USING s2 s" in sql2
    assert "WHEN MATCHED AND TRUE THEN UPDATE SET t.v = s.v" in sql2


def test_create_table_ddl():
    ddl = create_table_ddl(
        "lake.transcripts",
        [("conv_id", "string"), ("turn_idx", "int"), ("text", "string")],
        key_cols=["conv_id"], num_buckets=4096,
    )
    assert "USING iceberg" in ddl
    assert "PARTITIONED BY (bucket(4096, conv_id))" in ddl


def test_add_column_ddl():
    from haskell_dbfunctor_spark.lake.iceberg import add_column_ddl

    stmts = add_column_ddl("lake.transcripts", "quality", "double", 1.0)
    assert stmts[0] == (
        "ALTER TABLE lake.transcripts ADD COLUMN quality double"
    )
    assert stmts[1] == (
        "ALTER TABLE lake.transcripts ALTER COLUMN quality "
        "SET DEFAULT 1.0"
    )
    s = add_column_ddl("t", "lang", "string", "en")
    assert s[1].endswith("SET DEFAULT 'en'")
    assert add_column_ddl("t", "x", "long") == [
        "ALTER TABLE t ADD COLUMN x long"
    ]
