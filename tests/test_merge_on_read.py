"""Merge-on-read mode: O(batch) ingest writes with read-side collapse.

The contract: a feed replayed with mode="mor" reads back IDENTICAL to
the same feed replayed copy-on-write (including schema evolution and
delete tombstones), base files are never rewritten by a MoR commit,
compact_deltas folds the read tax away without changing the state, and
CoW merges subsume pending deltas of the buckets they touch."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
import pytest
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.cdc.apply import open_or_create_transcripts, replay
from haskell_dbfunctor_spark.cdc.generator import KEY_COLS, change_feed
from haskell_dbfunctor_spark.lake.table import LakeError

N_EVENTS = 4000
N_EPOCHS = 4
EVOLUTION = 2


def _state(table) -> list[tuple]:
    df = table.read().select(*KEY_COLS, "role", "text", "tool")
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def feed(spark):
    f = change_feed(
        spark, N_EVENTS, n_convs=50, max_turns=20,
        n_epochs=N_EPOCHS, evolution_epoch=EVOLUTION,
    ).persist()
    f.count()
    yield f
    f.unpersist()


def test_mor_replay_matches_cow_replay(spark, feed, tmp_path):
    cow = open_or_create_transcripts(spark, str(tmp_path / "cow"), num_buckets=8)
    replay(cow, feed, N_EPOCHS, evolution_epoch=EVOLUTION)
    mor = open_or_create_transcripts(spark, str(tmp_path / "mor"), num_buckets=8)
    stats = replay(mor, feed, N_EPOCHS, evolution_epoch=EVOLUTION, mode="mor")
    assert stats.epochs_applied == N_EPOCHS
    assert _state(mor) == _state(cow)
    assert all(m.extra.get("mode") == "mor" for m in stats.per_epoch)


def test_mor_commits_never_rewrite_base(spark, feed, tmp_path):
    mor = open_or_create_transcripts(spark, str(tmp_path / "t"), num_buckets=8)
    replay(mor, feed, 1, evolution_epoch=EVOLUTION, mode="mor", stop_after=1)
    base_after_first = dict(mor.manifest["buckets"])
    replay(mor, feed, N_EPOCHS, evolution_epoch=EVOLUTION, mode="mor")
    # base bucket files untouched across all subsequent MoR commits
    assert dict(mor.manifest["buckets"]) == base_after_first
    assert sum(len(f) for f in mor.manifest["delta_files"].values()) >= N_EPOCHS
    # idempotent: re-applying an epoch is a no-op
    m = mor.merge(
        feed.where(F.col("epoch") == 0).drop("tool"),
        epoch_id="epoch-00000", mode="mor",
    )
    assert m.skipped


def test_compact_deltas_preserves_state_and_clears_tax(spark, feed, tmp_path):
    mor = open_or_create_transcripts(spark, str(tmp_path / "t2"), num_buckets=8)
    replay(mor, feed, N_EPOCHS, evolution_epoch=EVOLUTION, mode="mor")
    before = _state(mor)
    res = mor.compact_deltas()
    assert res["buckets_compacted"] > 0 and res["delta_files_folded"] > 0
    assert mor.manifest["delta_files"] == {}
    assert _state(mor) == before
    # post-compaction reads take the plain (collapse-free) path and
    # further MoR merges keep working
    assert mor._delta_files() == []
    m = mor.merge(
        feed.where(F.col("epoch") == 0).withColumn(
            "seq", F.col("seq") + 10_000_000
        ),
        epoch_id="extra", mode="mor",
    )
    assert not m.skipped and mor._delta_files() != []


def test_cow_merge_subsumes_pending_deltas(spark, feed, tmp_path):
    a = open_or_create_transcripts(spark, str(tmp_path / "mix"), num_buckets=8)
    replay(a, feed, N_EPOCHS - 1, evolution_epoch=EVOLUTION, mode="mor",
           stop_after=N_EPOCHS - 1)
    assert a.manifest["delta_files"]
    # last epoch as CoW: touches (with this feed) every bucket
    replay(a, feed, N_EPOCHS, evolution_epoch=EVOLUTION, mode="cow")
    assert a.manifest["delta_files"] == {}
    b = open_or_create_transcripts(spark, str(tmp_path / "ref"), num_buckets=8)
    replay(b, feed, N_EPOCHS, evolution_epoch=EVOLUTION)
    assert _state(a) == _state(b)


def test_mor_rejects_subset_update_semantics(spark, feed, tmp_path):
    t = open_or_create_transcripts(spark, str(tmp_path / "t3"), num_buckets=8)
    with pytest.raises(LakeError):
        t.merge(feed.limit(10).drop("tool"), mode="mor", update_cols=["text"])


def test_replay_compact_every_bounds_pending_deltas(spark, feed, tmp_path):
    t = open_or_create_transcripts(spark, str(tmp_path / "t4"), num_buckets=8)
    replay(t, feed, N_EPOCHS, evolution_epoch=EVOLUTION, mode="mor",
           compact_every=2)
    # last epoch (4th) triggered a fold at epoch 4 -> nothing pending
    assert t.manifest["delta_files"] == {}
    ref = open_or_create_transcripts(spark, str(tmp_path / "t4r"), num_buckets=8)
    replay(ref, feed, N_EPOCHS, evolution_epoch=EVOLUTION)
    assert _state(t) == _state(ref)


def test_rebucket_and_compact_fold_pending_deltas(spark, feed, tmp_path):
    """Review-found corruption class: maintenance ops that read the
    collapsed view and rewrite the base MUST drop the folded delta
    refs, or a stale delta (higher __commit_seq than base's implicit 0)
    silently overrides newer data on later reads."""
    t = open_or_create_transcripts(spark, str(tmp_path / "rb"), num_buckets=8)
    replay(t, feed, N_EPOCHS, evolution_epoch=EVOLUTION, mode="mor")
    before = _state(t)

    t.rebucket(16)
    assert t.manifest["delta_files"] == {}  # folded, not carried
    assert _state(t) == before
    # newer CoW write after rebucket must not be shadowed by anything
    one = feed.where(F.col("epoch") == 0).limit(1).collect()[0]
    upd = spark.createDataFrame(
        [("U", one["conv_id"], one["turn_idx"], "assistant", "NEWEST",
          "bash", one["ts"], 99_000_000)],
        "op string, conv_id string, turn_idx int, role string, "
        "text string, tool string, ts timestamp, seq long",
    )
    t.merge(upd, epoch_id="after-rebucket")
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"] for r in t.read().collect()
    }
    assert got[(one["conv_id"], one["turn_idx"])] == "NEWEST"

    # compact() similarly folds + clears deltas of touched buckets
    t2 = open_or_create_transcripts(spark, str(tmp_path / "cp"), num_buckets=8)
    replay(t2, feed, N_EPOCHS, evolution_epoch=EVOLUTION, mode="mor")
    s2 = _state(t2)
    res = t2.compact(min_files=1)
    assert res["buckets_compacted"] > 0
    assert t2.manifest["delta_files"] == {}
    assert _state(t2) == s2


def test_mor_rejects_batch_missing_schema_columns(spark, feed, tmp_path):
    """A post-evolution batch that physically lacks an existing table
    column must be rejected in MoR mode (full-row replace would
    silently NULL the column where CoW preserves it)."""
    t = open_or_create_transcripts(spark, str(tmp_path / "mc"), num_buckets=8)
    replay(t, feed, N_EPOCHS, evolution_epoch=EVOLUTION, mode="mor")
    assert "tool" in t.schema.names
    with pytest.raises(LakeError, match="missing"):
        t.merge(
            feed.where(F.col("epoch") == 0).drop("tool"),
            epoch_id="old-producer", mode="mor",
        )


def test_compact_converges(spark, feed, tmp_path):
    """A bucket already reduced to one file is never re-compacted."""
    t = open_or_create_transcripts(spark, str(tmp_path / "cv"), num_buckets=8)
    replay(t, feed, N_EPOCHS, evolution_epoch=EVOLUTION)
    t.compact(min_files=1)
    res2 = t.compact(min_files=2)
    assert res2["buckets_compacted"] == 0  # strict no-op second pass


def test_epoch_prefix_namespaces_checkpoints(spark, feed, tmp_path):
    """Two different logical feeds applied to one table must not
    shadow each other's epoch numbers — distinct prefixes keep the
    exactly-once checkpoint sets disjoint."""
    t = open_or_create_transcripts(spark, str(tmp_path / "ns"), num_buckets=8)
    replay(t, feed, 1, evolution_epoch=EVOLUTION, stop_after=1)
    second = feed.where(F.col("epoch") == 0).withColumn(
        "seq", F.col("seq") + 50_000_000
    ).withColumn("epoch", F.lit(0))
    st = replay(t, second, 1, epoch_prefix="feed2")
    assert st.epochs_applied == 1 and st.epochs_skipped == 0
    # default prefix would have silently skipped it
    st2 = replay(t, second, 1)
    assert st2.epochs_applied == 0 and st2.epochs_skipped == 1


def test_property_mor_cow_equivalence_random_feeds(spark, tmp_path):
    """Property (hypothesis): for ARBITRARY change feeds — random
    insert/update/delete ops, colliding keys, ts ties broken by seq,
    random epoch boundaries — MoR and CoW replay converge to the same
    final state. Catches tie-breaking and tombstone subtleties the
    generator's distribution never hits."""
    import pyspark.sql.types as T2
    from hypothesis import given, settings, strategies as st

    from haskell_dbfunctor_spark.lake.table import LakeTable

    schema = T2.StructType([
        T2.StructField("k", T2.IntegerType()),
        T2.StructField("v", T2.StringType()),
        T2.StructField("ts", T2.IntegerType()),
    ])
    event = st.tuples(
        st.sampled_from(["I", "U", "D"]),
        st.integers(0, 4),            # key: few keys -> many collisions
        st.integers(0, 2),            # ts: few values -> ties on purpose
    )
    runs = [0]

    @settings(max_examples=6, deadline=None)
    @given(st.lists(event, min_size=1, max_size=20), st.integers(1, 4))
    def prop(events, n_epochs):
        runs[0] += 1
        rows = [
            ("e", op, k, f"v{seq}", ts, seq, seq % n_epochs)
            for seq, (op, k, ts) in enumerate(events)
        ]
        df = spark.createDataFrame(
            rows,
            "tag string, op string, k int, v string, ts int, seq long, "
            "epoch int",
        ).drop("tag")
        states = {}
        for mode in ("cow", "mor"):
            root = str(tmp_path / f"p{runs[0]}_{mode}")
            t = LakeTable.create(spark, root, schema, key_cols=["k"],
                                 num_buckets=4)
            for e in range(n_epochs):
                t.merge(
                    df.where(F.col("epoch") == e).drop("epoch"),
                    epoch_id=f"e{e}", order_cols=("ts", "seq"), mode=mode,
                )
            states[mode] = sorted(
                tuple(r) for r in t.read().select("k", "v", "ts").collect()
            )
        assert states["mor"] == states["cow"]

    prop()
