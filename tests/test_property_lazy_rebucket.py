"""Property-based state-machine check for lazy bucket-spec evolution:
arbitrary interleavings of MERGE batches, lazy rescales, budgeted
folds, compactions, and full rebuckets must leave the table equal to
the sequential dict-oracle LWW state — layout operations are
state-neutral no matter where they land in the sequence."""

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

FEED = T.StructType([
    T.StructField("k", T.IntegerType(), False),
    T.StructField("op", T.StringType(), True),
    T.StructField("v", T.StringType(), True),
    T.StructField("ts", T.LongType(), True),
    T.StructField("seq", T.LongType(), True),
])

event = st.tuples(
    st.integers(0, 9),                      # key (collisions likely)
    st.sampled_from(["U", "U", "D"]),       # delete-light mix
    st.text("ab", min_size=0, max_size=3),
    st.integers(0, 20),                     # ts ties likely
)

op_st = st.one_of(
    st.tuples(st.just("merge"),
              st.lists(event, min_size=1, max_size=10)),
    st.tuples(st.just("rescale"), st.sampled_from([2, 5, 8, 16])),
    st.tuples(st.just("migrate"), st.integers(1, 4)),
    st.tuples(st.just("compact"), st.just(None)),
    st.tuples(st.just("rebucket_full"), st.sampled_from([3, 6])),
)


def _apply_oracle(state, events_with_seq):
    best = {}
    for seq, (k, op, v, ts) in events_with_seq:
        cur = best.get(k)
        if cur is None or (ts, seq) >= cur[0]:
            best[k] = ((ts, seq), op, v)
    for k, (_, op, v) in best.items():
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(op_st, min_size=2, max_size=7))
def test_layout_ops_are_state_neutral(spark, tmp_path_factory, ops):
    root = str(tmp_path_factory.mktemp("lzp"))
    table = LakeTable.create(
        spark, root, SCHEMA, key_cols=["k"], num_buckets=4
    )
    state: dict = {}
    seq = 0
    epoch = 0
    for kind, arg in ops:
        if kind == "merge":
            rows = [
                {"k": k, "op": op, "v": v, "ts": ts, "seq": seq + i}
                for i, (k, op, v, ts) in enumerate(arg)
            ]
            df = spark.createDataFrame(pd.DataFrame(rows), FEED)
            table.merge(df, epoch_id=f"e{epoch}",
                        order_cols=("ts", "seq"), drop_cols=("seq",))
            _apply_oracle(state, list(enumerate(arg, start=seq)))
            seq += len(arg)
            epoch += 1
        elif kind == "rescale":
            if table.legacy_pending or arg == table.num_buckets:
                continue  # refused by contract; not this test's topic
            table.rebucket(arg, lazy=True)
        elif kind == "migrate":
            table.migrate_legacy(max_buckets=arg)
        elif kind == "compact":
            table.compact()
        else:  # rebucket_full — folds any pending overlay too
            table.rebucket(arg)
    got = {r.k: r.v for r in table.read().collect()}
    assert got == state
    # and completing any leftover migration changes nothing
    if table.legacy_pending:
        table.migrate_legacy()
        assert {r.k: r.v for r in table.read().collect()} == state
