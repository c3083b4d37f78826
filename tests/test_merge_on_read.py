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
