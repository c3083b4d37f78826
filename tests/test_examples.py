"""Unit tests for pipelines/examples.py (training-example construction)
and pipelines/dedup_text.py:passage_dedup_scrub — tiny hand-checkable
fixtures; the oracle parity at sf0.001/0.01 lives in
tests/test_entry_oracle.py (q105-q108)."""

import datetime as dt

from pyspark.sql import functions as F

from haskell_dbfunctor_spark.pipelines.dedup_text import passage_dedup_scrub
from haskell_dbfunctor_spark.pipelines.examples import (
    curriculum_shards, preference_pairs, sft_render_suffix_budget,
)


def _ts(i):
    return dt.datetime(2026, 1, 1, 0, i)


def test_sft_suffix_budget_keeps_latest_turns(spark):
    rows = [
        # conv 1: costs 5 each ("a=111" etc.); budget 12 -> last 2 kept
        (1, _ts(0), 0, "a=111"),
        (1, _ts(1), 1, "b=222"),
        (1, _ts(2), 2, "c=333"),
        # conv 2: one oversized turn -> conversation drops entirely
        (2, _ts(0), 3, "x" * 20),
    ]
    turns = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, turn string"
    )
    out = sft_render_suffix_budget(turns, 12).collect()
    assert len(out) == 1
    r = out[0]
    assert r.user_id == 1 and r.n_turns == 2 and r.n_chars == 10
    # forward order restored after the backward budget walk
    assert r.dialogue == "b=222\nc=333"


def test_sft_suffix_budget_tie_break_on_event_id(spark):
    t = _ts(0)
    rows = [(1, t, 2, "late"), (1, t, 1, "early")]
    turns = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, turn string"
    )
    # budget fits exactly one turn: the suffix walk (ts DESC, id DESC)
    # must keep event_id=2
    out = sft_render_suffix_budget(turns, 4).collect()
    assert len(out) == 1 and out[0].dialogue == "late"


def test_preference_pairs_deterministic_ties(spark):
    rows = [
        # g1: top score tied between ids 1,2 -> chosen=1; bottom tied
        # between 3,4 -> rejected=3
        ("g1", 1, 9), ("g1", 2, 9), ("g1", 3, 2), ("g1", 4, 2),
        # g2: all scores equal -> no pair
        ("g2", 5, 7), ("g2", 6, 7),
    ]
    scored = spark.createDataFrame(
        rows, "source string, doc_id long, score long"
    )
    out = {r.source: r for r in preference_pairs(scored).collect()}
    assert set(out) == {"g1"}
    r = out["g1"]
    assert (r.chosen_id, r.chosen_score) == (1, 9)
    assert (r.rejected_id, r.rejected_score) == (3, 2)


def test_curriculum_shards_balanced_and_ordered(spark):
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(12)], "doc_id long, score long"
    )
    out = curriculum_shards(
        df, 4, score_col="score", id_col="doc_id"
    ).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    # 12 rows / 4 shards -> exactly 3 per shard, score-contiguous
    assert sorted(by_shard) == [0, 1, 2, 3]
    assert all(len(v) == 3 for v in by_shard.values())
    assert max(r.score for r in by_shard[0]) < min(
        r.score for r in by_shard[1]
    )
    # rank0 is the 0-based global ascending position
    assert sorted(r.rank0 for r in out) == list(range(12))


def test_passage_dedup_scrub_keeps_first_occurrence(spark):
    dup = " ".join(["w"] * 4)  # one 4-word passage, shared
    uniq = "u1 u2 u3 u4"
    docs = spark.createDataFrame(
        [(1, dup + " " + uniq), (2, dup + " " + dup)],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in passage_dedup_scrub(docs, 4).collect()
    }
    # doc 1 (lowest id) keeps the shared passage + its unique tail
    assert out[1].n_pass_total == 2 and out[1].n_pass_kept == 2
    # doc 2 is the duplicate twice over: both passages scrubbed -> the
    # doc disappears from the output
    assert 2 not in out


def test_passage_dedup_scrub_reassembly_hash(spark):
    docs = spark.createDataFrame(
        [(7, "a b c d e f")], "doc_id long, text string"
    )
    r = passage_dedup_scrub(docs, 4).collect()[0]
    # passages: "a b c d" + "e f" -> reassembled text is the original
    expected = spark.range(1).select(
        F.md5(F.lit("a b c d e f")).alias("h")
    ).collect()[0].h
    assert r.clean_hash == expected and r.n_chars_clean == 11
