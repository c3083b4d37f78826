"""Property-based check (hypothesis): for arbitrary keyed I/U/D event
sequences, the engine's distributed LWW MERGE replay equals a
sequential per-event apply — the SURVEY §5.2 rigor upgrade over the
reference's inspect-by-eye goldens.
"""

import pandas as pd
import pyspark.sql.types as T
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from haskell_dbfunctor_spark.lake.table import LakeTable

SCHEMA = T.StructType([
    T.StructField("k", T.IntegerType(), False),
    T.StructField("v", T.StringType(), True),
    T.StructField("ts", T.LongType(), True),
])

event = st.tuples(
    st.integers(0, 5),                      # key (few keys => collisions)
    st.sampled_from(["I", "U", "D"]),       # op
    st.text("ab", min_size=0, max_size=3),  # value
    st.integers(0, 20),                     # ts (ties likely)
)


def batch_oracle(batches):
    """Sequential ground truth: batches apply in order; within a batch
    the max (ts, seq) event per key wins (LWW with seq tiebreak), and a
    winning D deletes the key."""
    state = {}
    for batch in batches:
        best = {}
        for seq, (k, op, v, ts) in batch:
            cur = best.get(k)
            if cur is None or (ts, seq) >= cur[0]:
                best[k] = ((ts, seq), op, v)
        for k, (_, op, v) in best.items():
            if op == "D":
                state.pop(k, None)
            else:
                state[k] = v
    return state


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(event, min_size=1, max_size=40))
def test_merge_replay_matches_sequential_apply(spark, tmp_path_factory, events):
    root = str(tmp_path_factory.mktemp("lww"))
    table = LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=4)
    pdf = pd.DataFrame(
        [
            {"k": k, "op": op, "v": v, "ts": ts, "seq": i}
            for i, (k, op, v, ts) in enumerate(events)
        ]
    )
    feed_schema = T.StructType([
        T.StructField("k", T.IntegerType(), False),
        T.StructField("op", T.StringType(), True),
        T.StructField("v", T.StringType(), True),
        T.StructField("ts", T.LongType(), True),
        T.StructField("seq", T.LongType(), True),
    ])
    df = spark.createDataFrame(pdf[["k", "op", "v", "ts", "seq"]], feed_schema)
    mid = len(events) // 2
    table.merge(df.where(df.seq < mid), epoch_id="b0",
                order_cols=("ts", "seq"), drop_cols=("seq",))
    table.merge(df.where(df.seq >= mid), epoch_id="b1",
                order_cols=("ts", "seq"), drop_cols=("seq",))

    got = {r.k: r.v for r in table.read().collect()}
    want = batch_oracle([
        list(enumerate(events))[:mid],
        list(enumerate(events))[mid:],
    ])
    assert got == want


nullable_event = st.tuples(
    st.one_of(st.none(), st.integers(0, 2)),  # key incl. NULL (collides)
    st.sampled_from(["I", "U", "D"]),
    st.text("ab", min_size=0, max_size=3),
    st.integers(0, 20),
)


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(nullable_event, min_size=1, max_size=40))
def test_nullable_key_merge_matches_sequential_apply(
    spark, tmp_path_factory, events
):
    """Same property over create(nullable_keys=True): NULL is a legal
    key VALUE — all NULL-keyed events address ONE logical row (the
    dict oracle's None key), through inserts, LWW updates with ts/seq
    ties, and deletes. Pins the null-safe apply join and the presence
    markers added when the silent NULL-drop was fixed."""
    schema = T.StructType([
        T.StructField("k", T.IntegerType(), True),
        T.StructField("v", T.StringType(), True),
        T.StructField("ts", T.LongType(), True),
    ])
    root = str(tmp_path_factory.mktemp("lww_null"))
    table = LakeTable.create(
        spark, root, schema, key_cols=["k"], num_buckets=4,
        nullable_keys=True,
    )
    feed_schema = T.StructType([
        T.StructField("k", T.IntegerType(), True),
        T.StructField("op", T.StringType(), True),
        T.StructField("v", T.StringType(), True),
        T.StructField("ts", T.LongType(), True),
        T.StructField("seq", T.LongType(), True),
    ])
    rows = [
        (k, op, v, ts, i) for i, (k, op, v, ts) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, feed_schema)
    mid = len(events) // 2
    table.merge(df.where(df.seq < mid), epoch_id="b0",
                order_cols=("ts", "seq"), drop_cols=("seq",))
    table.merge(df.where(df.seq >= mid), epoch_id="b1",
                order_cols=("ts", "seq"), drop_cols=("seq",))

    got = {r.k: r.v for r in table.read().collect()}
    want = batch_oracle([
        list(enumerate(events))[:mid],
        list(enumerate(events))[mid:],
    ])
    assert got == want
