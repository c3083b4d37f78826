"""Property soak (hypothesis): partial-patch MoR equals the dict oracle.

Random event sequences split into three epochs; each epoch applies as
CoW full-row, MoR full-row, or a MoR PARTIAL patch carrying a random
column subset of {a, b} (plus ts); random compact_deltas folds in
between. The final table must equal a driver-side dict replay with
column-wise patch semantics: within a batch the max-(ts, seq) row per
key wins and ONLY that row applies; a winning D removes the key
(tombstone resets every column — later patches cannot resurrect); a
winning partial U sets exactly its carried columns (NULL stays a set);
an insert-via-patch leaves uncarried columns NULL.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from haskell_dbfunctor_spark.lake.table import LakeTable

SCHEMA = T.StructType([
    T.StructField("k", T.IntegerType(), False),
    T.StructField("a", T.StringType(), True),
    T.StructField("b", T.StringType(), True),
    T.StructField("ts", T.LongType(), True),
])

event = st.tuples(
    st.integers(0, 5),                    # key — collisions likely
    st.sampled_from(["U", "U", "U", "D"]),
    st.one_of(st.none(), st.text(alphabet="xy", min_size=1, max_size=2)),
    st.one_of(st.none(), st.text(alphabet="pq", min_size=1, max_size=2)),
)

EPOCH_KINDS = ["cow", "mor", "partial_a", "partial_b", "partial_ab"]


def _carried(kind):
    return {"cow": ("a", "b"), "mor": ("a", "b"),
            "partial_a": ("a",), "partial_b": ("b",),
            "partial_ab": ("a", "b")}[kind]


def _oracle(batches):
    """batches: list of (kind, [(seq, (k, op, a, b)), ...])."""
    state = {}
    for kind, batch in batches:
        if not batch:
            continue
        cols = _carried(kind)
        best = {}
        for seq, (k, op, a, b) in batch:
            cur = best.get(k)
            if cur is None or seq >= cur[0]:
                best[k] = (seq, op, {"a": a, "b": b, "ts": seq})
        for k, (seq, op, vals) in best.items():
            if op == "D":
                state.pop(k, None)
                continue
            if kind.startswith("partial"):
                row = state.get(k, {"a": None, "b": None, "ts": None})
                row = dict(row)
                for c in (*cols, "ts"):
                    row[c] = vals[c]
                state[k] = row
            else:
                state[k] = {"a": vals["a"], "b": vals["b"], "ts": vals["ts"]}
    return state


@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(event, min_size=3, max_size=24),
    st.lists(st.sampled_from(EPOCH_KINDS), min_size=3, max_size=3),
    st.lists(st.booleans(), min_size=3, max_size=3),  # compact after epoch?
)
def test_partial_patches_match_dict_oracle(
    spark, tmp_path_factory, events, kinds, compacts
):
    root = str(tmp_path_factory.mktemp("morp"))
    table = LakeTable.create(spark, root, SCHEMA, key_cols=["k"],
                             num_buckets=4)
    pdf = pd.DataFrame(
        [{"k": k, "op": op, "a": a, "b": b, "ts": i, "seq": i}
         for i, (k, op, a, b) in enumerate(events)]
    )
    indexed = list(enumerate(events))
    third = max(len(events) // 3, 1)
    cuts = [(0, third), (third, 2 * third), (2 * third, len(events))]
    applied = []
    for i, (lo, hi) in enumerate(cuts):
        if hi <= lo:
            continue
        kind = kinds[i]
        cols = _carried(kind)
        sub = pdf[(pdf["seq"] >= lo) & (pdf["seq"] < hi)]
        batch = spark.createDataFrame(
            sub[["k", "op", *cols, "ts", "seq"]],
            f"k int, op string, {', '.join(c + ' string' for c in cols)}, "
            "ts long, seq long",
        )
        table.merge(
            batch, epoch_id=f"b{i}",
            order_cols=("ts", "seq"),
            mode="cow" if kind == "cow" else "mor",
            partial=kind.startswith("partial"),
        )
        applied.append((kind, indexed[lo:hi]))
        if compacts[i]:
            table.compact_deltas()

    want = _oracle(applied)
    got = {
        r["k"]: {"a": r["a"], "b": r["b"], "ts": r["ts"]}
        for r in table.read().collect()
    }
    assert got == want, (kinds, compacts)
