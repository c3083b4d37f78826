"""Incremental aggregate maintenance from a change data feed.

The materialized-view side of the CDC loop: instead of re-aggregating
the whole table after every commit, fold the (tiny) change feed into
the existing aggregate — O(changes) work per refresh, not O(table).
Counts and sums are self-maintainable under inserts/updates/deletes
(each change contributes a signed delta); min/max are not (a delete of
the current max needs a rescan) and are deliberately not offered here.

Built on ``LakeTable.changes(..., preimages=True)``: an update emits
a 'U_pre' row (old image, decrements its old group) and a 'U_post' row
(new image, increments its new group), so aggregates grouped by ANY
column — not just the table key — stay exact when a row migrates
between groups.

Scale posture: the delta aggregation shuffles only the change feed
(bucket-pruned by changes()); the merge into the base aggregate is a
full-outer hash join on the group key, whose cardinality is the number
of groups, not rows. The maintained result is bit-equal to a
recompute up to floating-point re-association in double sums —
identical after any sane output rounding (q55 proves it against a
from-scratch SQL oracle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

def _sign():
    """+1 for images entering the snapshot, -1 for images leaving it.
    A plain post-image feed (preimages=False, 'U' rows) would silently
    under-count — fail loudly on any unexpected tag instead. Built
    lazily: Column expressions need an active SparkContext, which may
    not exist at import time."""
    return (
        F.when(F.col("_change_type").isin("I", "U_post"), F.lit(1))
        .when(F.col("_change_type").isin("D", "U_pre"), F.lit(-1))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("change_feed_delta needs a preimage feed "
                          "(LakeTable.changes(preimages=True)); got tag "),
                    F.col("_change_type"),
                )
            ).cast("int")
        )
    )


def group_sums(
    df: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str = "n",
) -> DataFrame:
    """The base aggregate this module maintains: per-group row count +
    per-column sums, with the column-name contract ``sum_<col>`` that
    ``maintain_group_sums`` expects."""
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias(count_col),
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
    )


def change_feed_delta(
    changes: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str = "n",
) -> DataFrame:
    """Signed per-group deltas from a preimage change feed: one hash
    aggregation over the changes only."""
    if "_change_type" not in changes.columns:
        raise ValueError(
            "changes must come from LakeTable.changes(preimages=True)"
        )
    return changes.groupBy(*group_cols).agg(
        F.sum(_sign()).alias(count_col),
        *[F.sum(F.col(c) * _sign()).alias(f"sum_{c}") for c in sum_cols],
    )


def maintain_group_sums(
    base_agg: DataFrame,
    changes: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    count_col: str = "n",
) -> DataFrame:
    """base_agg (from ``group_sums`` over the OLD snapshot) + the
    change feed between old and new snapshots -> the aggregate of the
    NEW snapshot. Groups whose maintained count reaches zero disappear
    (as they would in a recompute)."""
    # union + ONE hash aggregation, not a full-outer join: groupBy
    # treats NULL group keys as one group (a null-unsafe join condition
    # would split them), F.sum's null-skipping keeps an all-NULL
    # group's sum NULL (as a recompute would), and integer sum columns
    # keep their integer type — maintained output is schema- and
    # value-identical to group_sums over the new snapshot.
    delta = change_feed_delta(changes, group_cols, sum_cols, count_col)
    cols = [*group_cols, count_col, *[f"sum_{c}" for c in sum_cols]]
    u = base_agg.select(*cols).unionByName(delta.select(*cols))
    return (
        u.groupBy(*group_cols)
        .agg(
            F.sum(count_col).alias(count_col),
            *[F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols],
        )
        .where(F.col(count_col) > 0)
    )
