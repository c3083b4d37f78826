"""Property-based soak (hypothesis) for ROW LINEAGE: under ANY
interleaving of CoW AND full-row MoR merges (direct-published OR
routed through a write-audit-publish staged chain — round 5),
predicate DML (CoW, deletion-vector, and MoR modes), delta
compaction, and layout maintenance (compact / rebucket), a
create(row_lineage=True) table must keep

  1. value semantics IDENTICAL to the sequential batch oracle
     (lineage is invisible to state);
  2. row ids UNIQUE across the live table after every operation;
  3. row ids STABLE: a key alive before and after an operation keeps
     its id (within one merge a key has ONE LWW winner, so there is
     no delete+reinsert inside an op — absence in between is the only
     legal way an id changes);
  4. __last_updated_version within [1, version], and the manifest's
     next_row_id strictly above every live ORGANIC id (WAP-inserted
     rows carry reservation-block ids above ROW_ID_RES_BASE, which
     the organic high-water mark deliberately ignores).
"""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F, types as T

from haskell_dbfunctor_spark.lake.table import (
    ROW_ID_RES_BASE,
    LakeTable,
)

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

OPS = ["none", "compact", "rebucket", "update_cow", "update_dv",
       "delete_cow", "delete_dv", "compact_deltas", "update_mor",
       "delete_mor"]


def _run_op(table, action):
    if action == "compact":
        table.compact(min_files=1)
    elif action == "compact_deltas":
        table.compact_deltas()
    elif action == "update_mor":
        table.update_where("k % 3 = 0", {"v": F.lit("moru")}, mode="mor")
    elif action == "delete_mor":
        table.delete_where("k = 4", mode="mor")
    elif action == "rebucket":
        table.rebucket(8 if table.num_buckets == 4 else 4)
    elif action == "update_cow":
        table.update_where("k % 3 = 1", {"v": F.lit("upd")})
    elif action == "update_dv":
        table.update_where("k % 3 = 2", {"v": F.lit("dvu")}, mode="dv")
    elif action == "delete_cow":
        table.delete_where("k = 5")
    elif action == "delete_dv":
        table.delete_where("k = 6", mode="dv")


def _oracle_op(state, action):
    if action in ("update_cow", "update_dv", "update_mor"):
        rem = {"update_cow": 1, "update_dv": 2, "update_mor": 0}[action]
        val = {"update_cow": "upd", "update_dv": "dvu",
               "update_mor": "moru"}[action]
        for k in state:
            if k % 3 == rem:
                state[k] = val
    elif action == "delete_cow":
        state.pop(5, None)
    elif action == "delete_dv":
        state.pop(6, None)
    elif action == "delete_mor":
        state.pop(4, None)


def _merge_oracle(state, batch):
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


def _lineage(table):
    return {
        r["k"]: (r["v"], r["__row_id"], r["__last_updated_version"])
        for r in table.read(with_lineage=True).collect()
    }


@settings(
    max_examples=5, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(event, min_size=4, max_size=24),
    st.lists(st.sampled_from(OPS), min_size=3, max_size=3),
    st.booleans(),  # two-level (spilled) manifest layout
    st.lists(st.sampled_from(["cow", "mor", "dv"]), min_size=3,
             max_size=3),
    # route this cut's merge through a WAP staged chain + publish
    # (round 5: staged lineage merges claim a reservation block)
    st.lists(st.booleans(), min_size=3, max_size=3),
)
def test_lineage_invariants_under_interleaving(
    spark, tmp_path_factory, events, schedule, spill, modes, staged
):
    root = str(tmp_path_factory.mktemp("rl_prop"))
    table = LakeTable.create(
        spark, root, SCHEMA, key_cols=["k"], num_buckets=4,
        row_lineage=True,
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

    state: dict = {}
    prev = _lineage(table)
    for i, (lo, hi) in enumerate(cuts):
        if hi > lo:
            mode = modes[i]
            if staged[i] and mode == "dv":
                mode = "cow"  # DV staging is refused for all tables
            if mode == "dv" and table.manifest.get("delta_files"):
                # documented refusal: DV merges can't land on buckets
                # with pending MoR deltas — fold first (the production
                # pattern the error message prescribes)
                table.compact_deltas()
            batch = df.where((df.seq >= lo) & (df.seq < hi))
            if staged[i]:
                fork = LakeTable.load(spark, root)
                fork.merge(
                    batch, epoch_id=f"b{i}", order_cols=("ts", "seq"),
                    drop_cols=(), mode=mode, stage_only=True,
                )
                fork.publish()
                table.manifest = table._load_latest_published_manifest()
            else:
                table.merge(
                    batch, epoch_id=f"b{i}", order_cols=("ts", "seq"),
                    drop_cols=(),  # MoR full-row mode needs all columns
                    mode=mode,
                )
            _merge_oracle(state, indexed[lo:hi])
            cur = _lineage(table)
            _check(table, cur, prev, state, schedule, i, "merge")
            prev = cur
        _run_op(table, schedule[i])
        _oracle_op(state, schedule[i])
        cur = _lineage(table)
        _check(table, cur, prev, state, schedule, i, schedule[i])
        prev = cur


def _check(table, cur, prev, state, schedule, i, what):
    ctx = (schedule, i, what)
    # 1. value semantics == oracle
    assert {k: v for k, (v, _, _) in cur.items()} == state, ctx
    ids = [rid for (_, rid, _) in cur.values()]
    # 2. unique ids
    assert len(set(ids)) == len(ids), ctx
    # 3. stable ids for keys alive across the op
    for k in set(cur) & set(prev):
        assert cur[k][1] == prev[k][1], (ctx, k)
    # 4. version stamps + high-water mark (organic ids only: WAP
    # rows carry reservation-block ids the organic mark ignores)
    v = table.version
    assert all(1 <= luv <= v for (_, _, luv) in cur.values()), ctx
    organic = [i for i in ids if i < ROW_ID_RES_BASE]
    if organic:
        assert int(table.manifest["next_row_id"]) > max(organic), ctx
