"""Property-based check (hypothesis): asof_join over arbitrary keyed
event frames matches pandas.merge_asof computed per key — inclusive
and exclusive match, missing keys, empty right side, and out-of-order
input rows (the Spark implementation must not depend on input order).
"""

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from haskell_dbfunctor_spark.operators import asof_join

BASE = dt.datetime(2024, 1, 1)

# (key, ts_offset_seconds) — duplicates on the LEFT are allowed (each
# left row matches independently); RIGHT (key, ts) pairs are deduped in
# the strategy since the operator documents arbitrary choice on ties
left_row = st.tuples(st.integers(0, 3), st.integers(0, 120))
right_row = st.tuples(st.integers(0, 3), st.integers(0, 120))


def _mk_left(spark, rows):
    return spark.createDataFrame(
        [
            {"k": k, "ts": BASE + dt.timedelta(seconds=s), "lid": i}
            for i, (k, s) in enumerate(rows)
        ],
        "k int, ts timestamp, lid long",
    )


def _mk_right(spark, rows):
    dedup = {(k, s): None for k, s in rows}
    return spark.createDataFrame(
        [
            {"k": k, "ts": BASE + dt.timedelta(seconds=s), "rv": k * 1000 + s}
            for (k, s) in dedup
        ],
        "k int, ts timestamp, rv long",
    )


def _pandas_reference(lrows, rrows, allow_exact):
    dedup = sorted({(k, s) for k, s in rrows})
    out = {}
    for i, (k, s) in enumerate(lrows):
        best = None
        for rk, rs in dedup:
            if rk != k:
                continue
            ok = rs <= s if allow_exact else rs < s
            if ok and (best is None or rs > best[0]):
                best = (rs, rk * 1000 + rs)
        out[i] = best[1] if best else None
    return out


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(left_row, min_size=1, max_size=25),
    st.lists(right_row, min_size=0, max_size=25),
    st.booleans(),
)
def test_asof_join_matches_reference(spark, lrows, rrows, allow_exact):
    left = _mk_left(spark, lrows)
    right = _mk_right(spark, rrows)
    got = {
        r["lid"]: r["rv"]
        for r in asof_join(
            left, right, "k", "ts", allow_exact_match=allow_exact
        ).collect()
    }
    want = _pandas_reference(lrows, rrows, allow_exact)
    assert got == want


def test_asof_join_agrees_with_pandas_merge_asof(spark):
    """Cross-check the whole operator against pandas' own merge_asof on
    a dense deterministic grid (both directions)."""
    lrows = [(k, s) for k in range(3) for s in range(0, 60, 7)]
    rrows = [(k, s) for k in range(3) for s in range(0, 60, 11)]
    lpdf = pd.DataFrame(
        [{"k": k, "ts": BASE + dt.timedelta(seconds=s), "lid": i}
         for i, (k, s) in enumerate(lrows)]
    ).sort_values("ts")
    rpdf = pd.DataFrame(
        [{"k": k, "ts": BASE + dt.timedelta(seconds=s), "rv": k * 1000 + s}
         for (k, s) in rrows]
    ).sort_values("ts")
    for allow_exact in (True, False):
        ref = pd.merge_asof(
            lpdf, rpdf, on="ts", by="k",
            allow_exact_matches=allow_exact, direction="backward",
        )
        want = {
            int(r.lid): (None if pd.isna(r.rv) else int(r.rv))
            for r in ref.itertuples()
        }
        got = {
            r["lid"]: r["rv"]
            for r in asof_join(
                _mk_left(spark, lrows), _mk_right(spark, rrows),
                "k", "ts", allow_exact_match=allow_exact,
            ).collect()
        }
        assert got == want
