"""Distributed frequency sketches: exact heavy hitters at bounded shuffle.

The reference computes frequency tables with a full ``runGroupBy`` +
``raggCountStar`` pass (``/root/reference/src/RTable/Core.hs:3381-3469``)
— at web scale that shuffles EVERY distinct item (billions of tokens)
to count a handful of frequent ones. This module bounds the shuffle
with the classic two-pass heavy-hitters recipe (Misra & Gries 1982;
"Frequent" / Space-Saving family, Metwally et al. 2005):

1. **Candidate pass** — each input partition maintains a Misra–Gries
   summary with ``capacity`` counters over Arrow batches
   (``mapInPandas``: the per-batch counting is pandas ``value_counts``,
   C-speed; the sketch merge is O(capacity) per batch, never per row).
   The pruning step subtracts the (capacity+1)-th largest count from
   every counter and drops the non-positive ones, so each subtraction
   of δ burns ≥ (capacity+1)·δ of total weight — the standard bound:
   an item's undercount ≤ n_p/(capacity+1) within a partition of n_p
   rows. Pigeonhole across partitions: any item with GLOBAL count
   > n/(capacity+1) must exceed n_p/(capacity+1) in at least one
   partition, so the union of per-partition candidate sets is a
   SUPERSET of every global heavy hitter. Candidate volume is bounded
   by capacity × partitions — metadata-scale, independent of n or of
   the number of distinct items.
2. **Exact verify pass** — a broadcast semi-join of the input against
   the candidate set, then an exact hash-count of candidates only, and
   the exact threshold filter ``count × k > n``. The result EQUALS the
   full-groupBy answer (``HAVING count(*)*k > n``) — the sketch only
   bounds which items reach the shuffle, never what is reported.

Scale shape: pass 1 shuffles nothing (narrow map + tiny candidate
output); pass 2 shuffles only rows matching ≤ capacity×P candidate
items. A plain groupBy-count over a 10^10-token web corpus shuffles
~10^9 distinct keys; this shuffles the heavy tail only.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _mg_candidates(df: DataFrame, item_col: str, capacity: int) -> DataFrame:
    """Per-partition Misra–Gries candidate items (see module doc).

    NULL items are ignored (SQL COUNT/GROUP semantics for frequency
    thresholds treat NULL as its own group; heavy-hitter users almost
    never want it — filter upstream to include it deliberately).
    """
    field = df.schema[item_col]
    out_schema = f"`{item_col}` {field.dataType.simpleString()}"

    def gen(batches):
        counts: dict = {}
        for pdf in batches:
            vc = pdf[item_col].value_counts(dropna=True)
            for v, c in vc.items():
                counts[v] = counts.get(v, 0) + int(c)
            if len(counts) > capacity:
                # prune to ≤ capacity entries: subtract the
                # (capacity+1)-th largest count, drop the rest
                pivot = sorted(counts.values(), reverse=True)[capacity]
                counts = {v: c - pivot for v, c in counts.items()
                          if c > pivot}
        yield pd.DataFrame({item_col: list(counts.keys())})

    return df.select(item_col).mapInPandas(gen, schema=out_schema)


def frequent_items(
    df: DataFrame,
    item_col: str,
    k: int,
    *,
    capacity: int | None = None,
    count_col: str = "cnt",
) -> DataFrame:
    """Items whose exact count satisfies ``count × k > n`` (frequency
    share strictly above 1/k of the non-NULL rows), with their exact
    counts — identical to the full ``GROUP BY ... HAVING count(*)*k > n``
    answer, computed with a candidate-bounded shuffle (module doc).

    ``capacity`` (default ``k``) is the per-partition sketch size; any
    value ≥ k preserves the superset guarantee (threshold n/k is above
    the sketch's n/(capacity+1) survival bound). Raise it to also
    surface near-threshold items for a later, looser filter.
    """
    if k < 1:
        raise ValueError(f"frequent_items: k must be ≥ 1, got {k}")
    cap = int(capacity if capacity is not None else k)
    if cap < k:
        raise ValueError(
            f"frequent_items: capacity {cap} < k {k} breaks the "
            "candidate superset guarantee"
        )
    items = df.select(item_col).where(F.col(item_col).isNotNull())
    cands = _mg_candidates(items, item_col, cap).distinct()
    # total BEFORE the candidate filter — the threshold is a share of
    # the whole stream. One columnar count action; at the lake this
    # could come from manifest row counts instead.
    n = items.count()
    counted = (
        items.join(F.broadcast(cands), on=item_col, how="left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias(count_col))
    )
    return counted.where(F.col(count_col) * k > F.lit(n))
