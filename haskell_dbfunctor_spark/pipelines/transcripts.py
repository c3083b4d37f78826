"""Transcript-integrity and tool-usage analytics over multi-turn
conversation data — the north-rule payload shape (conv_id, turn_idx,
role, text, tool, ts).

A CDC-ingested transcript lake needs read-side audits the reference's
relational surface (RTable filters/aggregations,
/root/reference/src/RTable/Core.hs:2565-2715) stops short of:

- :func:`integrity_audit` — per-conversation structural QA: duplicate
  turn indexes, index gaps, adjacent same-role turns. The natural gate
  to run over the replayed LWW state before a training export (a
  conversation that fails it points at a feed bug or a lost update).
- :func:`tool_transition_counts` — the tool-usage bigram matrix
  (which tool follows which, per conversation order) — the standard
  first look at agent-trace behavior.

Both are one conversation-keyed window pass + one hash aggregation;
the window PARTITIONS by the conversation key, so no task ever sorts
more than one conversation (bounded: thousands of turns, never
billions) and Catalyst reuses the window's exchange for the groupBy
when the keys line up. No UDFs, no driver-side state — the plans
survive a 100 TB transcript corpus unchanged.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

__all__ = [
    "integrity_audit",
    "tool_transition_counts",
]


def _order(order_cols: Sequence[str]) -> list[Column]:
    return [F.col(c) for c in order_cols]


def integrity_audit(
    turns: DataFrame,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    order_cols: Sequence[str] = ("turn_idx",),
) -> DataFrame:
    """Per-conversation structural integrity report.

    ``order_cols`` must be a TOTAL order within each conversation
    (turn_idx alone is not total when duplicates exist — add ts /
    event id tiebreaks so the adjacent-role check is deterministic).

    Returns one row per conversation:

    - ``n_turns`` — row count;
    - ``n_dup_idx`` — rows beyond the first per turn index (0 = all
      indexes unique);
    - ``n_gaps`` — missing indexes inside [min_idx, max_idx];
    - ``n_role_repeats`` — adjacent turn pairs with the same role
      (strict user/assistant alternation would make this 0);
    - ``is_clean`` — 1 when all three counters are 0.

    Plan: ONE lag() window partitioned by the conversation key, ONE
    hash aggregation on the same key (exchange reused). The distinct
    index count rides the same aggregation (partial-distinct, no
    second shuffle stage over the raw rows).
    """
    w = W.partitionBy(conv_col).orderBy(*_order(order_cols))
    prev_role = F.lag(role_col).over(w)
    flagged = turns.withColumn(
        "__role_repeat",
        F.when(prev_role == F.col(role_col), F.lit(1)).otherwise(F.lit(0)),
    )
    n_distinct = F.count_distinct(F.col(idx_col))
    out = flagged.groupBy(conv_col).agg(
        F.count(F.lit(1)).alias("n_turns"),
        (F.count(F.lit(1)) - n_distinct).alias("n_dup_idx"),
        (
            (F.max(idx_col) - F.min(idx_col) + F.lit(1)) - n_distinct
        ).cast("long").alias("n_gaps"),
        F.sum("__role_repeat").cast("long").alias("n_role_repeats"),
    )
    clean = (
        (F.col("n_dup_idx") == 0)
        & (F.col("n_gaps") == 0)
        & (F.col("n_role_repeats") == 0)
    )
    return out.withColumn(
        "is_clean", F.when(clean, F.lit(1)).otherwise(F.lit(0))
    )


def tool_transition_counts(
    turns: DataFrame,
    *,
    conv_col: str = "conv_id",
    tool_col: str = "tool",
    order_cols: Sequence[str] = ("turn_idx",),
    k: int | None = None,
    start_marker: str = "START",
) -> DataFrame:
    """Tool-usage transition (bigram) counts across the corpus.

    Within each conversation, take the turns that invoked a tool
    (``tool_col`` non-NULL) in conversation order; count each
    (previous tool -> tool) pair, with ``start_marker`` standing in
    for a conversation's first tool call. Returns
    (prev_tool, tool, n_trans), the top ``k`` by count when ``k`` is
    given (ties broken on the pair, so the cut is deterministic).

    Plan: filter (pushed to the scan — NULL tools never shuffle), one
    conversation-partitioned lag() window, one hash aggregation;
    ``k`` lands as TakeOrderedAndProject, never a global sort.
    """
    w = W.partitionBy(conv_col).orderBy(*_order(order_cols))
    pairs = (
        turns.where(F.col(tool_col).isNotNull())
        .withColumn(
            "__prev", F.coalesce(F.lag(tool_col).over(w), F.lit(start_marker))
        )
    )
    out = pairs.groupBy(
        F.col("__prev").alias("prev_tool"), F.col(tool_col).alias("tool")
    ).agg(F.count(F.lit(1)).alias("n_trans"))
    if k is not None:
        out = out.orderBy(
            F.col("n_trans").desc(), "prev_tool", "tool"
        ).limit(k)
    return out
