"""Training-example construction over conversation-shaped data.

The reference stops at relational results (an ``RTable`` printed or
written to CSV — /root/reference/src/RTable/Core.hs:205-260); a
training-data pipeline keeps going: the curated rows must become model
inputs. This module covers that last mile with three first-class ops,
each expressed as pure DataFrame algebra (hash aggregations, bounded
windows, one distributed global rank) so the plan survives a 100 TB
corpus:

- :func:`sft_render_suffix_budget` — render each conversation's turns
  into one prompt string, keeping the longest SUFFIX of turns that fits
  a character budget (context-window packing: latest turns win).
- :func:`preference_pairs` — per prompt-group (chosen, rejected)
  example pairs picked by a quality score with deterministic
  tie-breaks, one hash aggregation.
- :func:`curriculum_shards` — order the corpus by a difficulty score
  and assign row-count-balanced curriculum shards from a DISTRIBUTED
  global rank (operators/core.py:surrogate_key's zipWithIndex — never
  an unpartitioned window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..operators.core import surrogate_key

__all__ = [
    "sft_render_suffix_budget",
    "preference_pairs",
    "curriculum_shards",
    "sft_loss_mask_spans",
]


def sft_render_suffix_budget(
    turns: DataFrame,
    budget_chars: int,
    *,
    conv_col: str = "user_id",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
    render_col: str = "turn",
    sep: str = "\n",
) -> DataFrame:
    """Render conversations into single SFT strings under a length
    budget, keeping the longest suffix of turns (the turns closest to
    the end of the conversation — what a context window actually sees).

    ``turns`` must carry ``conv_col``, ``order_cols`` (a total order
    within each conversation) and a pre-rendered ``render_col`` string
    per turn. Returns one row per conversation that kept >= 1 turn:
    (conv, n_turns, n_chars, dialogue).

    Scale: the only window is PARTITIONED by the conversation key —
    conversations are bounded (thousands of turns, not billions), so
    no task ever sees more than one conversation's rows; the final
    assembly is a hash aggregation with an ``array_sort`` of
    (order, turn) structs, not a second window. The reference's
    analog is a groupNoAggList fold (Core.hs:3495-3527) — single
    threaded there, partition-parallel here.
    """
    cost = F.length(F.col(render_col))
    # suffix-cumulative cost: walk the conversation BACKWARDS
    w = (
        W.partitionBy(conv_col)
        .orderBy(*[F.col(c).desc() for c in order_cols])
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    kept = (
        turns.withColumn("__cost", cost)
        .withColumn("__cum", F.sum("__cost").over(w))
        .filter(F.col("__cum") <= F.lit(budget_chars))
    )
    order_struct = F.struct(*[F.col(c) for c in order_cols], F.col(render_col))
    return kept.groupBy(conv_col).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum("__cost").cast("long").alias("n_chars"),
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(order_struct)),
                lambda s: s[render_col],
            ),
        ).alias("dialogue"),
    )


def preference_pairs(
    scored: DataFrame,
    *,
    group_col: str = "source",
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Per-group (chosen, rejected) preference pairs: chosen = highest
    score (ties -> lowest id), rejected = lowest score (ties -> lowest
    id); groups where every candidate scores identically produce no
    pair. ONE hash aggregation — ``min_by`` over a (score, id) struct
    makes the tie-break deterministic without a window, so the op is a
    single shuffle keyed by the prompt group at any corpus size.
    """
    neg = (-F.col(score_col)).alias("s")
    pos = F.col(score_col).alias("s")
    tie = F.col(id_col).alias("i")
    out = scored.groupBy(group_col).agg(
        F.min_by(id_col, F.struct(neg, tie)).alias("chosen_id"),
        F.max(score_col).alias("chosen_score"),
        F.min_by(id_col, F.struct(pos, tie)).alias("rejected_id"),
        F.min(score_col).alias("rejected_score"),
    )
    return out.filter(F.col("chosen_score") > F.col("rejected_score"))


def curriculum_shards(
    df: DataFrame,
    n_shards: int,
    *,
    score_col: str,
    id_col: str,
    total_rows: int | None = None,
) -> DataFrame:
    """Assign row-count-balanced curriculum shards: global ascending
    order by (score, id), shard k gets ranks [k*N/S, (k+1)*N/S).

    NTILE semantics without NTILE's unpartitioned window: the global
    rank comes from :func:`surrogate_key`'s distributed zipWithIndex
    (range-partitioned sort + O(partitions) offset pass), so the sort
    is a normal distributed sort and no single task ever materializes
    the corpus. ``total_rows`` (one count if not passed) is
    metadata-scale driver state, same class as the offset pass.
    Returns the input plus ``rank0``/``shard`` columns.
    """
    ranked = surrogate_key(df, "rank0", [score_col, id_col], init=0)
    n = total_rows if total_rows is not None else ranked.count()
    return ranked.withColumn(
        "shard",
        F.expr(f"CAST((rank0 * {int(n_shards)}) DIV {int(n)} AS INT)"),
    )


def sft_loss_mask_spans(
    turns: DataFrame,
    *,
    conv_col: str = "conv_id",
    order_col: str = "event_id",
    role_col: str = "role",
    text_col: str = "text",
    train_role: str = "assistant",
) -> DataFrame:
    """Loss-mask spans for SFT: render each conversation as the
    concatenation of ``"<role>: <text>\\n"`` in turn order and emit,
    for every ``train_role`` turn, its character span [start, end) in
    the rendered string — exactly the mask an SFT trainer applies so
    the loss covers assistant tokens only.

    Plan shape: ONE hash aggregation (collect the conversation's
    (order, role, len) triples, sort in-array) followed by ONE
    ``aggregate()`` fold that threads a running offset through the
    turns and appends spans for train-role turns — all JVM-side
    codegen, no window, no Python. Per the repo's HOF rule, the fold
    touches ONLY its accumulator fields and lambda args (an outer
    column referenced inside would re-evaluate per element).
    Conversations are the aggregation key, so the plan is a single
    shuffle at any corpus size; a conversation's turn list is bounded
    (thousands, not millions).

    Returns one row per train-role turn: (conv_col, order_col,
    span_start, span_end, conv_chars)."""
    ln = F.length(
        F.concat(
            F.col(role_col), F.lit(": "),
            F.coalesce(F.col(text_col), F.lit("")), F.lit("\n"),
        )
    )
    g = turns.groupBy(conv_col).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(order_col).cast("long").alias("o"),
                    (F.col(role_col) == train_role).alias("train"),
                    ln.cast("long").alias("ln"),
                )
            )
        ).alias("ts")
    )
    empty_spans = F.expr(
        "CAST(array() AS array<struct<o:bigint,s:bigint,e:bigint>>)"
    )
    folded = g.select(
        conv_col,
        F.aggregate(
            "ts",
            F.struct(
                F.lit(0).cast("long").alias("off"),
                empty_spans.alias("spans"),
            ),
            lambda acc, t: F.struct(
                (acc["off"] + t["ln"]).alias("off"),
                F.when(
                    t["train"],
                    F.concat(
                        acc["spans"],
                        F.array(
                            F.struct(
                                t["o"].alias("o"),
                                acc["off"].alias("s"),
                                (acc["off"] + t["ln"]).alias("e"),
                            )
                        ),
                    ),
                ).otherwise(acc["spans"]).alias("spans"),
            ),
        ).alias("acc"),
    )
    ex = folded.select(
        conv_col,
        F.col("acc.off").alias("conv_chars"),
        F.explode("acc.spans").alias("sp"),
    )
    return ex.select(
        conv_col,
        F.col("sp.o").alias(order_col),
        F.col("sp.s").alias("span_start"),
        F.col("sp.e").alias("span_end"),
        "conv_chars",
    )
