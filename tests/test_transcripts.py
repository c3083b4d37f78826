"""Unit tests for pipelines/transcripts.py (integrity audit, tool
transitions) and pipelines/sampling.py:mixture_plan — tiny
hand-checkable fixtures; oracle parity at sf0.001/0.01 lives in
tests/test_entry_oracle.py (q114-q116)."""

import math

from haskell_dbfunctor_spark.pipelines.sampling import mixture_plan
from haskell_dbfunctor_spark.pipelines.transcripts import (
    integrity_audit, tool_transition_counts,
)


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string"
    )


def test_integrity_audit_clean_conversation(spark):
    rows = [
        ("c1", 0, "user", None),
        ("c1", 1, "assistant", None),
        ("c1", 2, "user", None),
        ("c1", 3, "assistant", None),
    ]
    r = integrity_audit(_turns(spark, rows)).collect()[0]
    assert (r.n_turns, r.n_dup_idx, r.n_gaps, r.n_role_repeats) == (4, 0, 0, 0)
    assert r.is_clean == 1


def test_integrity_audit_flags_each_defect(spark):
    rows = [
        # duplicate turn_idx 1 (two rows), gap at 2, and the dup pair
        # is user,user -> one role repeat; 3->4 assistant,assistant
        ("c2", 0, "user", None),
        ("c2", 1, "user", None),
        ("c2", 1, "user", None),
        ("c2", 3, "assistant", None),
        ("c2", 4, "assistant", None),
    ]
    r = integrity_audit(_turns(spark, rows)).collect()[0]
    assert r.n_turns == 5
    assert r.n_dup_idx == 1          # 5 rows, 4 distinct indexes
    assert r.n_gaps == 1             # idx 2 missing inside [0, 4]
    assert r.n_role_repeats == 3     # (1,1), (1,1-dup), (3,4)
    assert r.is_clean == 0


def test_integrity_audit_per_conversation_isolation(spark):
    rows = [
        ("a", 0, "user", None),
        ("a", 1, "assistant", None),
        ("b", 5, "user", None),      # min_idx 5: no leading gap counted
        ("b", 6, "user", None),
    ]
    out = {r.conv_id: r for r in integrity_audit(_turns(spark, rows)).collect()}
    assert out["a"].is_clean == 1
    assert out["b"].n_gaps == 0 and out["b"].n_role_repeats == 1


def test_tool_transitions_counts_and_start_marker(spark):
    rows = [
        ("c1", 0, "user", "search"),
        ("c1", 1, "assistant", None),   # non-tool turn: skipped
        ("c1", 2, "user", "fetch"),
        ("c1", 3, "user", "fetch"),
        ("c2", 0, "user", "search"),
    ]
    out = {
        (r.prev_tool, r.tool): r.n_trans
        for r in tool_transition_counts(_turns(spark, rows)).collect()
    }
    assert out == {
        ("START", "search"): 2,
        ("search", "fetch"): 1,
        ("fetch", "fetch"): 1,
    }


def test_tool_transitions_top_k_deterministic_cut(spark):
    rows = [("c", i, "user", f"t{i % 4}") for i in range(8)]
    out = tool_transition_counts(
        _turns(spark, rows), order_cols=("turn_idx",), k=2
    ).collect()
    # t0->t1, t1->t2, t2->t3 all count 2; the k=2 cut breaks the tie
    # on (prev_tool, tool), so the kept pairs are deterministic
    assert [(r.prev_tool, r.tool, r.n_trans) for r in out] == [
        ("t0", "t1", 2), ("t1", "t2", 2),
    ]


def test_mixture_plan_weights_and_epochs(spark):
    # sources: A has 9 tokens, B has 1 -> sqrt weights 3:1
    rows = [("A", "w " * 8 + "w"), ("B", "x")]
    df = spark.createDataFrame(rows, "source string, text string")
    from pyspark.sql import functions as F

    out = {
        r.source: r
        for r in mixture_plan(
            df, "source", F.size(F.split(F.col("text"), " ")),
            alpha=0.5, target_total=1000,
        ).collect()
    }
    assert out["A"].n_tokens == 9 and out["B"].n_tokens == 1
    assert math.isclose(out["A"].weight, 0.75) and math.isclose(
        out["B"].weight, 0.25
    )
    assert out["A"].planned_tokens == 750 and out["B"].planned_tokens == 250
    # epochs: planned / available -> B must repeat 250x
    assert math.isclose(out["A"].epochs, 83.3333)
    assert math.isclose(out["B"].epochs, 250.0)


def test_mixture_plan_alpha_one_is_proportional(spark):
    rows = [("A", "a b c d"), ("B", "a b c d")]
    df = spark.createDataFrame(rows, "source string, text string")
    from pyspark.sql import functions as F

    out = mixture_plan(
        df, "source", F.size(F.split(F.col("text"), " ")),
        alpha=1.0, target_total=100,
    ).collect()
    assert all(math.isclose(r.weight, 0.5) for r in out)
    assert all(r.planned_tokens == 50 for r in out)
