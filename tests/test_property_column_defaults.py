"""Property-based soak (hypothesis) for COLUMN DEFAULTS: a default
added mid-history must read correctly under ANY interleaving of CoW
merges (batches that carry the column — with real values or explicit
NULLs — and batches that don't), compaction, and rebucketing:

  - rows last written before the add read the initial-default;
  - post-add inserts that omit the column get the write-default;
  - post-add matched updates that omit the column KEEP the target's
    value (no silent default stomp);
  - explicit values and explicit NULLs survive verbatim;
  - rewrites (merge-touched buckets, compact, rebucket) materialize
    defaults without changing what any row reads.
"""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from haskell_dbfunctor_spark.lake.table import LakeTable

SCHEMA = T.StructType([
    T.StructField("k", T.IntegerType(), False),
    T.StructField("v", T.StringType(), True),
    T.StructField("ts", T.LongType(), True),
    T.StructField("seq", T.LongType(), True),
])

DEFAULT = 1.0

event = st.tuples(
    st.integers(0, 7),
    st.sampled_from(["U", "U", "U", "D"]),
    st.text(alphabet="ab", min_size=1, max_size=2),
    st.integers(0, 50),
    st.sampled_from([2.0, 3.5, None]),   # q value IF the batch carries q
)

MAINT = ["none", "compact", "rebucket"]


def _run_maint(table, action):
    if action == "compact":
        table.compact(min_files=1)
    elif action == "rebucket":
        table.rebucket(8 if table.num_buckets == 4 else 4)


@settings(
    max_examples=5, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(event, min_size=4, max_size=24),
    st.integers(0, 2),                     # add_column after batch j
    st.lists(st.booleans(), min_size=3, max_size=3),   # batch carries q?
    st.lists(st.sampled_from(MAINT), min_size=3, max_size=3),
)
def test_defaults_under_interleaving(
    spark, tmp_path_factory, events, add_after, carries_q, maint
):
    root = str(tmp_path_factory.mktemp("cd_prop"))
    table = LakeTable.create(
        spark, root, SCHEMA, key_cols=["k"], num_buckets=4
    )
    pdf = pd.DataFrame(
        [{"k": k, "op": op, "v": v, "ts": ts, "seq": i, "q": q}
         for i, (k, op, v, ts, q) in enumerate(events)]
    )
    df = spark.createDataFrame(
        pdf[["k", "op", "v", "ts", "seq", "q"]],
        "k int, op string, v string, ts long, seq long, q double",
    )
    third = max(len(events) // 3, 1)
    cuts = [(0, third), (third, 2 * third), (2 * third, len(events))]
    indexed = list(enumerate(events))

    # oracle state: k -> (v, q_state); q_state is the sentinel
    # "DEFAULT" (reads as DEFAULT once the column exists), an explicit
    # float, or an explicit None
    state: dict = {}
    added = False

    def apply_batch(batch, with_q):
        best = {}
        for seq, (k, op, v, ts, q) in batch:
            cur = best.get(k)
            if cur is None or (ts, seq) >= cur[0]:
                best[k] = ((ts, seq), op, v, q)
        for k, (_, op, v, q) in best.items():
            if op == "D":
                state.pop(k, None)
                continue
            if not added:
                # pre-add writes: the column doesn't exist yet — the
                # row will read the initial-default after the add
                state[k] = (v, "DEFAULT")
            elif with_q:
                state[k] = (v, q)
            else:
                # post-add batch omitting q: matched keeps the target
                # value; an insert takes the write-default
                prev_q = state[k][1] if k in state else "DEFAULT"
                state[k] = (v, prev_q)

    for i, (lo, hi) in enumerate(cuts):
        if hi > lo:
            batch = df.where((df.seq >= lo) & (df.seq < hi))
            if not added or not carries_q[i]:
                batch = batch.drop("q")
            table.merge(batch, epoch_id=f"b{i}", order_cols=("ts", "seq"))
            apply_batch(indexed[lo:hi], added and carries_q[i])
        if i == add_after and not added:
            table.add_column("q", "double", default=DEFAULT)
            added = True
        _run_maint(table, maint[i])

        got = {
            r["k"]: (r["v"], r["q"] if added else None)
            for r in table.read().collect()
        } if added else {
            r["k"]: (r["v"], None) for r in table.read().collect()
        }
        want = {
            k: (v, (DEFAULT if qs == "DEFAULT" else qs) if added else None)
            for k, (v, qs) in state.items()
        }
        assert got == want, (i, add_after, carries_q, maint)
