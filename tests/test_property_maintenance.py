"""Property-based soak (hypothesis): ANY interleaving of layout
maintenance — compact (plain or clustered), compact_deltas, rebucket,
analyze, expire_snapshots — between CoW/MoR merges leaves the logical
state EXACTLY equal to the sequential batch oracle. Maintenance is
layout-only; if any interleaving could corrupt state (the classic
stale-delta / dropped-bucket / dead-stats bugs), this finds it."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row, types as T

from haskell_dbfunctor_spark.lake.table import LakeTable

SCHEMA = T.StructType([
    T.StructField("k", T.IntegerType(), False),
    T.StructField("v", T.StringType(), True),
    T.StructField("ts", T.LongType(), True),
    T.StructField("seq", T.LongType(), True),
])

event = st.tuples(
    st.integers(0, 7),                   # key — few keys force collisions
    st.sampled_from(["U", "U", "U", "D"]),
    st.text(alphabet="abc", min_size=1, max_size=3),
    st.integers(0, 50),                  # ts (ties likely)
)

MAINT = ["none", "compact", "compact_sorted", "compact_deltas",
         "rebucket", "analyze", "expire", "compact_budget",
         "expire_prune"]


def _run_maint(table, action):
    if action == "compact":
        table.compact(min_files=1)
    elif action == "compact_budget":
        table.compact(min_files=1, max_buckets=1)
    elif action == "expire_prune":
        table.expire_snapshots(keep_last=2, prune_lineage=True)
    elif action == "compact_sorted":
        table.compact(sort_by="seq")
    elif action == "compact_deltas":
        table.compact_deltas()
    elif action == "rebucket":
        table.rebucket(8 if table.num_buckets == 4 else 4)
    elif action == "analyze":
        table.analyze(["seq"])
    elif action == "expire":
        table.expire_snapshots(keep_last=2)


def _batch_oracle(batches):
    """Batches apply in order (incoming wins across batches); within a
    batch the max-(ts, seq) event per key wins; a winning D deletes —
    identical to tests/test_property_lww.py:batch_oracle."""
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
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(event, min_size=3, max_size=30),
    st.lists(st.sampled_from(MAINT), min_size=3, max_size=3),
    st.lists(st.sampled_from(["cow", "mor"]), min_size=3, max_size=3),
    st.booleans(),  # two-level (spilled) manifest layout
)
def test_state_invariant_under_maintenance_interleaving(
    spark, tmp_path_factory, events, schedule, modes, spill
):
    root = str(tmp_path_factory.mktemp("maint"))
    table = LakeTable.create(
        spark, root, SCHEMA, key_cols=["k"], num_buckets=4,
        properties={"metadata.spill-bytes": "0"} if spill else None,
    )
    pdf = pd.DataFrame(
        [{"k": k, "op": op, "v": v, "ts": ts, "seq": i}
         for i, (k, op, v, ts) in enumerate(events)]
    )
    df = spark.createDataFrame(
        pdf[["k", "op", "v", "ts", "seq"]],
        "k int, op string, v string, ts long, seq long",
    )
    third = max(len(events) // 3, 1)
    cuts = [(0, third), (third, 2 * third), (2 * third, len(events))]
    indexed = list(enumerate(events))
    applied_batches = []
    for i, (lo, hi) in enumerate(cuts):
        batch = df.where((df.seq >= lo) & (df.seq < hi))
        if hi > lo:
            table.merge(batch, epoch_id=f"b{i}",
                        order_cols=("ts", "seq"), mode=modes[i])
            applied_batches.append(indexed[lo:hi])
        _run_maint(table, schedule[i])

    want = _batch_oracle(applied_batches)
    got = {r["k"]: r["v"] for r in table.read().collect()}
    assert got == want, (schedule, modes)


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_read_where_consistent_after_clustered_compact(spark, tmp_path, mode):
    """compact(sort_by) + analyze after a CoW or MoR second epoch:
    pruned range reads keep agreeing with the full filter, including a
    key UPDATED INTO the range and one deleted out of it."""
    table = LakeTable.create(
        spark, str(tmp_path / f"lake_{mode}"), SCHEMA,
        key_cols=["k"], num_buckets=4,
    )

    def b(rows):
        return spark.createDataFrame(
            [Row(k=k, op=op, v=v, ts=s, seq=s) for (k, op, v, s) in rows],
            "k int, op string, v string, ts long, seq long",
        )

    table.merge(b([(k, "U", f"v{k}", k) for k in range(8)]), epoch_id="e0")
    table.merge(b([(1, "U", "x", 100), (2, "D", None, 101)]),
                epoch_id="e1", mode=mode)
    table.compact(sort_by="seq")
    table.analyze(["seq"])
    got = sorted(
        (r["k"], r["seq"]) for r in table.read_where("seq", 90, None).collect()
    )
    assert got == [(1, 100)]
    full = sorted(
        (r["k"], r["seq"])
        for r in table.read().where("seq >= 90").collect()
    )
    assert got == full
    assert table.read().where("k = 2").count() == 0
