"""Property-based soak for the PURGE path (round 5, VERDICT r04 item
8): forget_keys(..., purge=True) interleaved with CDC merges — both a
hypothesis-driven sequential interleaving and a genuinely RACING
writer thread. Invariants after every step:

  1. state == the sequential oracle (forget removes exactly the
     probed conversations; merges upsert);
  2. after a purge, NO file under the state root contains a forgotten
     conversation's rows (physical erasure, checked by reading every
     parquet file on disk — not just the live snapshot);
  3. no live file is ever swept: reads keep working and fsck stays
     green (expire/orphan ran under the documented grace contract
     while a writer raced).
"""

import os
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.cdc.apply import (
    open_or_create_rollup,
    open_or_create_transcripts,
)
from haskell_dbfunctor_spark.lake.forget import forget_keys
from haskell_dbfunctor_spark.lake.table import CommitConflict
from haskell_dbfunctor_spark.lake.transaction import (
    Catalog,
    TransactionAborted,
)


def _batch(spark, convs, tag, seq):
    rows = [
        (f"c-{c}", t, "user" if t % 2 == 0 else "assistant",
         f"SECRET-{c}-{tag}", None, seq)
        for c in convs
        for t in range(2)
    ]
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, seq long",
    ).select(
        "conv_id", "turn_idx", "role", "text", "tool",
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("seq")).alias("ts"),
        F.lit("U").alias("op"), "seq",
    )


def _probe(spark, convs):
    return spark.createDataFrame(
        [(f"c-{c}",) for c in convs], "conv_id string"
    )


def _state(table):
    return {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in table.read().collect()
    }


def _convs_on_disk(root):
    """Every conv_id present in ANY parquet file under the root —
    live snapshot, retained history, deltas, quarantine: the physical
    erasure check reads the disk, not the manifest."""
    out = set()
    for dirpath, _, files in os.walk(root):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            try:
                t = pq.read_table(os.path.join(dirpath, f))
            except Exception:
                continue
            if "conv_id" in t.column_names:
                out.update(t.column("conv_id").to_pylist())
    return out


@settings(
    max_examples=3, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.one_of(
            st.tuples(
                st.just("merge"),
                st.sets(st.integers(0, 9), min_size=1, max_size=4),
            ),
            st.tuples(
                st.just("forget"),
                st.sets(st.integers(0, 9), min_size=1, max_size=3),
            ),
        ),
        min_size=3, max_size=6,
    ),
    st.booleans(),  # mor mode for the state merges
)
def test_forget_purge_interleaved_with_merges(
    spark, tmp_path_factory, ops, mor
):
    tmp = tmp_path_factory.mktemp("fp_prop")
    state = open_or_create_transcripts(
        spark, str(tmp / "state"), num_buckets=4
    )
    rollup = open_or_create_rollup(spark, str(tmp / "rollup"), ["role"])
    cat = Catalog(spark, str(tmp / "_cat"))
    oracle: dict = {}
    forgotten_live: set = set()
    seq = 0
    from haskell_dbfunctor_spark.cdc.apply import _txn_epoch

    for i, (kind, convs) in enumerate(ops):
        if kind == "merge":
            seq += 1
            # the production shape: state + rollup committed
            # atomically per epoch (the same txn path forget uses)
            ah = cat.read(state.root)
            _txn_epoch(
                ah, rollup, cat,
                _batch(spark, sorted(convs), f"e{i}", seq),
                f"e{i}",
                {"op_col": "op", "order_cols": ("ts", "seq"),
                 "mode": "mor" if mor else "cow"},
                ("role",), ah.version,
            )
            state.manifest = state._load_latest_published_manifest()
            rollup.manifest = rollup._load_latest_published_manifest()
            for c in convs:
                for t in range(2):
                    oracle[(f"c-{c}", t)] = f"SECRET-{c}-e{i}"
                forgotten_live.discard(c)
        else:
            out = forget_keys(
                cat, state, _probe(spark, sorted(convs)),
                rollup=rollup, purge=True, purge_grace_seconds=0,
            )
            state.manifest = state._load_latest_published_manifest()
            rollup.manifest = rollup._load_latest_published_manifest()
            present = {
                c for c in convs if (f"c-{c}", 0) in oracle
            }
            assert (out["matched"] > 0) == bool(present)
            for c in convs:
                oracle.pop((f"c-{c}", 0), None)
                oracle.pop((f"c-{c}", 1), None)
                if c in present:
                    forgotten_live.add(c)
            if present:
                # PHYSICAL erasure: no file under the root still
                # carries a forgotten conversation
                on_disk = _convs_on_disk(str(tmp / "state"))
                gone = {f"c-{c}" for c in forgotten_live}
                assert not (on_disk & gone), (ops, i)
        assert _state(state) == oracle, (ops, i)
    # rollup leg stayed consistent through every purge
    roll = {
        r["role"]: r["live_rows"]
        for r in rollup.read().collect()
        if r["live_rows"]
    }
    want = {
        r["role"]: r["n"]
        for r in state.read().groupBy("role")
        .agg(F.count("*").alias("n")).collect()
    }
    assert roll == want


def test_forget_purge_races_cdc_writer(spark, tmp_path):
    """A live CDC writer merges disjoint conversations WHILE
    forget(purge=True) runs (documented grace contract: orphan sweep
    grace above the longest write). Afterwards: every writer row is
    present, every forgotten row physically gone, fsck green."""
    from haskell_dbfunctor_spark.lake.fsck import fsck

    state = open_or_create_transcripts(
        spark, str(tmp_path / "state"), num_buckets=4
    )
    cat = Catalog(spark, str(tmp_path / "_cat"))
    state.merge(
        _batch(spark, range(10), "seed", 0),
        epoch_id="seed", op_col="op", order_cols=("ts", "seq"),
    )

    errors: list = []

    def writer():
        try:
            h = open_or_create_transcripts(
                spark, str(tmp_path / "state"), num_buckets=4
            )
            for i in range(6):
                h.merge(
                    _batch(spark, range(20 + i * 3, 23 + i * 3),
                           f"w{i}", 100 + i),
                    epoch_id=f"w{i}", op_col="op",
                    order_cols=("ts", "seq"),
                )
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append(e)

    th = threading.Thread(target=writer)
    th.start()
    victims = [0, 1, 2, 3]
    for v in victims:
        for _ in range(8):
            try:
                forget_keys(
                    cat, state, _probe(spark, [v]), purge=True,
                    purge_grace_seconds=3600,
                )
                break
            except (CommitConflict, TransactionAborted):
                state.manifest = state._load_latest_published_manifest()
        else:
            pytest.fail(f"forget of c-{v} never committed")
    th.join()
    assert not errors, errors
    state.manifest = state._load_latest_published_manifest()
    got = _state(state)
    # every writer conversation landed with its final epoch's text
    for i in range(6):
        for c in range(20 + i * 3, 23 + i * 3):
            assert got[(f"c-{c}", 0)] == f"SECRET-{c}-w{i}"
    # forgotten conversations gone logically...
    for v in victims:
        assert (f"c-{v}", 0) not in got
    # ...and physically erased from the RETAINED files (racing
    # snapshots written during the forget are expired by the LAST
    # purge; files younger than the grace window may linger as
    # orphans — that is the documented trade, so sweep once more
    # with grace 0 now that no writer is in flight)
    state.expire_snapshots(keep_last=1)
    state.remove_orphans(grace_seconds=0)
    on_disk = _convs_on_disk(str(tmp_path / "state"))
    assert not (on_disk & {f"c-{v}" for v in victims})
    # no live file was swept: full read works and fsck agrees
    assert fsck(state)["ok"]
