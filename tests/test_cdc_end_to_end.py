"""End-to-end CDC replay correctness (the north-star gate).

Replays a deterministic keyed I/U/D change feed into the lake table and
asserts the final state equals DuckDB's sequential apply — per-turn
text equality under stable (conv_id, turn_idx) ordering — including:
idempotent re-apply, mid-stream resume from checkpoint, schema
evolution (tool column arriving mid-stream), LWW dedup of intra-epoch
duplicate updates, and delete-then-reinsert.
"""

import pandas as pd
import pytest

from haskell_dbfunctor_spark.cdc.apply import open_or_create_transcripts, replay
from haskell_dbfunctor_spark.cdc.generator import change_feed, epoch_batch
from haskell_dbfunctor_spark.cdc import oracle

N_EVENTS = 4000
N_EPOCHS = 5
EVOLUTION_EPOCH = 2


def _engine_state(table) -> pd.DataFrame:
    pdf = table.read().toPandas()
    return (
        pdf.sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def _assert_state_equal(got: pd.DataFrame, want: pd.DataFrame):
    assert len(got) == len(want), f"row count {len(got)} != oracle {len(want)}"
    for col in ["conv_id", "turn_idx", "role", "text", "tool"]:
        if col not in want.columns:
            continue
        g = got[col].where(pd.notna(got[col]), None).tolist()
        w = want[col].where(pd.notna(want[col]), None).tolist()
        assert g == w, f"column {col} diverges from oracle"
    # ts equality at second granularity
    gts = pd.to_datetime(got["ts"]).astype("int64").tolist()
    wts = pd.to_datetime(want["ts"]).astype("int64").tolist()
    assert gts == wts, "ts diverges from oracle"


@pytest.fixture(scope="module")
def feed(spark):
    f = change_feed(
        spark,
        N_EVENTS,
        n_convs=60,
        max_turns=20,
        n_epochs=N_EPOCHS,
        evolution_epoch=EVOLUTION_EPOCH,
    ).persist()
    f.count()
    yield f
    f.unpersist()


@pytest.fixture(scope="module")
def feed_pdf(feed):
    return feed.toPandas()


def test_generator_is_deterministic_and_skewed(spark, feed_pdf):
    assert len(feed_pdf) == N_EVENTS
    # monotone ts in seq
    s = feed_pdf.sort_values("seq")
    assert s["ts"].is_monotonic_increasing
    # skew: hot conversations exist
    top = feed_pdf["conv_id"].value_counts()
    assert top.iloc[0] > 5 * top.median()
    # duplicate keys within an epoch (LWW exercise)
    dups = feed_pdf.groupby(["epoch", "conv_id", "turn_idx"]).size()
    assert (dups > 1).any()
    # pre-evolution epochs have no tool values
    assert feed_pdf[feed_pdf.epoch < EVOLUTION_EPOCH]["tool"].isna().all()
    assert feed_pdf[feed_pdf.epoch >= EVOLUTION_EPOCH]["tool"].notna().any()


def test_full_replay_matches_sequential_oracle(spark, feed, feed_pdf, tmp_path):
    table = open_or_create_transcripts(spark, str(tmp_path / "transcripts"))
    stats = replay(table, feed, N_EPOCHS, evolution_epoch=EVOLUTION_EPOCH)
    assert stats.epochs_applied == N_EPOCHS
    assert stats.events_applied == N_EVENTS

    want = oracle.final_state(feed_pdf, evolution_epoch=EVOLUTION_EPOCH)
    got = _engine_state(table)
    # schema evolved: tool column exists after epoch >= 2 was applied
    assert "tool" in got.columns
    _assert_state_equal(got, want)

    # metrics/lineage recorded per epoch
    m = table.metrics().toPandas()
    assert len(m) == N_EPOCHS
    assert (m["n_source"] > 0).all()
    lin = table.lineage()
    assert all("files" in r for r in lin)


def test_replay_is_idempotent(spark, feed, feed_pdf, tmp_path):
    table = open_or_create_transcripts(spark, str(tmp_path / "t2"))
    replay(table, feed, N_EPOCHS, evolution_epoch=EVOLUTION_EPOCH)
    v1 = table.version
    stats2 = replay(table, feed, N_EPOCHS, evolution_epoch=EVOLUTION_EPOCH)
    assert stats2.epochs_applied == 0
    assert stats2.epochs_skipped == N_EPOCHS
    assert table.version == v1
    want = oracle.final_state(feed_pdf, evolution_epoch=EVOLUTION_EPOCH)
    _assert_state_equal(_engine_state(table), want)


def test_resume_from_checkpoint_mid_stream(spark, feed, feed_pdf, tmp_path):
    root = str(tmp_path / "t3")
    table = open_or_create_transcripts(spark, root)
    # "crash" after 2 epochs
    replay(table, feed, N_EPOCHS, evolution_epoch=EVOLUTION_EPOCH, stop_after=2)
    assert table.last_applied_epoch() == "epoch-00001"

    # reopen from disk (fresh process semantics) and resume
    from haskell_dbfunctor_spark.lake.table import LakeTable

    table2 = LakeTable.load(spark, root)
    stats = replay(table2, feed, N_EPOCHS, evolution_epoch=EVOLUTION_EPOCH)
    assert stats.epochs_skipped == 2
    assert stats.epochs_applied == N_EPOCHS - 2
    want = oracle.final_state(feed_pdf, evolution_epoch=EVOLUTION_EPOCH)
    _assert_state_equal(_engine_state(table2), want)


def test_partial_replay_matches_partial_oracle(spark, feed, feed_pdf, tmp_path):
    table = open_or_create_transcripts(spark, str(tmp_path / "t4"))
    replay(table, feed, 3, evolution_epoch=EVOLUTION_EPOCH)
    want = oracle.final_state(
        feed_pdf, max_epoch=2, evolution_epoch=EVOLUTION_EPOCH
    )
    _assert_state_equal(_engine_state(table), want)


def test_merge_only_rewrites_touched_buckets(spark, feed, tmp_path):
    """Scale property: an epoch touching few keys rewrites few buckets."""
    table = open_or_create_transcripts(spark, str(tmp_path / "t5"), num_buckets=64)
    replay(table, feed, N_EPOCHS, evolution_epoch=EVOLUTION_EPOCH)
    before = dict(table.manifest["buckets"])

    import pyspark.sql.functions as F

    one_key = feed.limit(1).select("conv_id", "turn_idx").collect()[0]
    tiny = (
        feed.where(
            (F.col("conv_id") == one_key.conv_id)
            & (F.col("turn_idx") == one_key.turn_idx)
        )
        .limit(1)
        .withColumn("op", F.lit("U"))
    )
    st = table.merge(tiny, epoch_id="tiny-epoch")
    assert st.buckets_touched == 1
    after = table.manifest["buckets"]
    changed = [b for b in after if after[b] != before.get(b)]
    assert len(changed) == 1


def test_replay_correct_under_100x_hotter_skew(spark, tmp_path):
    """North-rule skew evidence (correctness side; bench.py --skew is
    the throughput side): 90% of events hammer ONE conversation over 5
    turn keys — the LWW dedup (hash agg with map-side partials) and the
    MERGE must still produce the sequential-oracle state."""
    hot = change_feed(
        spark, N_EVENTS, n_convs=60, max_turns=5, n_epochs=N_EPOCHS,
        evolution_epoch=EVOLUTION_EPOCH, hot_fraction=0.9, n_hot=1,
    )
    pdf = hot.toPandas()
    top = pdf["conv_id"].value_counts()
    assert top.iloc[0] > 0.8 * len(pdf)  # genuinely degenerate
    table = open_or_create_transcripts(spark, str(tmp_path / "hot"))
    replay(table, hot, N_EPOCHS, evolution_epoch=EVOLUTION_EPOCH)
    want = oracle.final_state(pdf, evolution_epoch=EVOLUTION_EPOCH)
    _assert_state_equal(_engine_state(table), want)


def test_full_replay_with_row_lineage(spark, feed, feed_pdf, tmp_path):
    """The north-star replay on a row-lineage table: identical final
    state (lineage is invisible to value semantics), unique row ids,
    version stamps bounded by history, idempotent re-apply, and ids
    STABLE for keys whose last touch predates the final epoch."""
    table = open_or_create_transcripts(
        spark, str(tmp_path / "transcripts_rl"), row_lineage=True
    )
    replay(table, feed, N_EPOCHS, evolution_epoch=EVOLUTION_EPOCH)
    want = oracle.final_state(feed_pdf, evolution_epoch=EVOLUTION_EPOCH)
    got = _engine_state(table)
    _assert_state_equal(got, want)

    lin = table.read(with_lineage=True).toPandas()
    assert lin["__row_id"].is_unique
    assert lin["__last_updated_version"].between(1, table.version).all()
    hwm = int(table.manifest["next_row_id"])
    assert hwm > int(lin["__row_id"].max())

    # ids per key before/after an idempotent re-apply: unchanged
    before = dict(
        zip(zip(lin["conv_id"], lin["turn_idx"]), lin["__row_id"])
    )
    stats2 = replay(table, feed, N_EPOCHS, evolution_epoch=EVOLUTION_EPOCH)
    assert stats2.epochs_applied == 0 and stats2.epochs_skipped == N_EPOCHS
    lin2 = table.read(with_lineage=True).toPandas()
    after = dict(
        zip(zip(lin2["conv_id"], lin2["turn_idx"]), lin2["__row_id"])
    )
    assert after == before
