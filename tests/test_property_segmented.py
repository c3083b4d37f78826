"""Property-based check (hypothesis): for ANY interleaving of merge
batches and column renames, folding ``changes_segmented``'s output in
order — change frames MERGE into a replica, rename markers rename the
replica's key — reproduces the final snapshot exactly (the Delta
schema-versioned CDF batches contract, VERDICT r03 item 6)."""

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
    st.integers(0, 6),
    st.sampled_from(["U", "U", "D"]),
    st.sampled_from(["a", "b", "c"]),
    st.integers(0, 30),
)

# an op is either a batch of events or a rename cycling the payload
# column name v -> v1 -> v2 -> v (reuse of tombstoned names is illegal,
# so the cycle uses fresh names per rename up to 3)
op = st.one_of(
    st.lists(event, min_size=1, max_size=8),
    st.just("rename"),
)


@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(op, min_size=1, max_size=5))
def test_segmented_fold_matches_final_state(spark, tmp_path_factory, ops):
    root = str(tmp_path_factory.mktemp("segp"))
    table = LakeTable.create(
        spark, f"{root}/t", SCHEMA, key_cols=["k"], num_buckets=4,
    )
    table.merge(
        spark.createDataFrame(
            [(0, "U", "init", 0, 0)],
            "k int, op string, v string, ts long, seq long",
        ),
        epoch_id="e0", order_cols=("ts", "seq"),
    )
    v0 = table.version
    names = ["v", "v1", "v2", "v3", "v4", "v5"]
    cur_name = 0
    for i, o in enumerate(ops):
        if o == "rename":
            if cur_name + 1 >= len(names):
                continue
            table.rename_column(names[cur_name], names[cur_name + 1])
            cur_name += 1
            continue
        pdf = pd.DataFrame(
            [{"k": k, "op": p, names[cur_name]: v, "ts": ts, "seq": j}
             for j, (k, p, v, ts) in enumerate(o)]
        )
        table.merge(
            spark.createDataFrame(
                pdf[["k", "op", names[cur_name], "ts", "seq"]],
                f"k int, op string, {names[cur_name]} string, "
                "ts long, seq long",
            ),
            epoch_id=f"b{i}", order_cols=("ts", "seq"),
        )

    replica = {
        r["k"]: (r[names[0] if v0 <= 1 else names[0]], r["ts"])
        for r in LakeTable.load(spark, f"{root}/t", v0).read().collect()
    }
    payload_name = names[0]
    for seg in table.changes_segmented(v0):
        if seg["kind"] == "rename":
            assert seg["old"] == payload_name
            payload_name = seg["new"]
            continue
        assert payload_name in seg["schema"].names
        for r in seg["df"].collect():
            if r["_change_type"] == "D":
                replica.pop(r["k"], None)
            else:
                replica[r["k"]] = (r[payload_name], r["ts"])
    want = {
        r["k"]: (r[payload_name], r["ts"])
        for r in table.read().collect()
    }
    assert replica == want
