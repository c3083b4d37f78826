"""Mirror of the driver's correctness gate: run each __spark_entry__
queries() entry and its oracle_sql() side by side (sf0.001 for speed;
the driver uses sf0.01) and compare row count, column names, and
order-insensitive values.
"""

import math
import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(pdf: pd.DataFrame) -> list[str]:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "∅"
        if isinstance(v, float):
            return f"{v:.4f}"
        if hasattr(v, "isoformat"):
            return v.isoformat()
        return str(v)

    rows = ["|".join(norm(v) for v in r) for r in pdf.itertuples(index=False)]
    return sorted(rows)


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_every_query_has_an_oracle():
    missing = set(QUERIES) - set(ORACLES)
    assert not missing, f"queries without oracle: {missing}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    got = QUERIES[name](spark, sf_dir).toPandas()
    con = _duck(sf_dir)
    want = con.execute(ORACLES[name]).df()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    g, w = _canon(got), _canon(want)
    mism = [i for i, (a, b) in enumerate(zip(g, w)) if a != b][:3]
    assert g == w, f"{name}: first diffs at {mism}: " + "; ".join(
        f"{g[i]!r} != {w[i]!r}" for i in mism
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None
