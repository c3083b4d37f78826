"""Explicit skew handling: salted equi-joins.

AQE's skew-join splitting only sees *post-shuffle byte sizes*; it is
blind to joins whose key space is tiny (e.g. 31 distinct shingle words
across a whole corpus) where it happily coalesces to one partition and
then a single task materializes the entire O(n·m) join output. For
those joins the salt must be explicit: hash-salt the left side into S
sub-keys and replicate the right side S times, so the join key becomes
(key, salt) and the output spreads across S× more partitions.

Cost model: right side is duplicated S times through the shuffle —
correct when the right relation is small relative to the join output
(the exact regime where key-skew hurts). This is the same salting the
CDC north rule requires for hot conv_id keys (BASELINE.json), exposed
as a reusable operator.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

SALT_COL = "__salt"


def salted_equi_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str] | str,
    *,
    salt: int = 32,
    salt_by: Sequence[str] | None = None,
    how: str = "inner",
    extra_cond: Column | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Equi-join on low-cardinality / skewed key(s) with explicit salting.

    ``on``: equi-join column name(s), present on both sides.
    ``salt_by``: left columns whose hash picks the salt bucket (default:
    all non-join columns, making the spread deterministic).
    ``extra_cond``: additional join predicate referencing ``l.``/``r.``
    aliased columns.  Only inner/left joins are supported (replicating
    the right side would multiply unmatched right rows otherwise).
    ``num_partitions``: explicitly pin the join parallelism. AQE
    coalesces partitions by *input* size, so a join whose input is
    small but whose output explodes still lands in one task unless the
    shuffle is pinned; an explicit repartition-by-num is exempt from
    AQE coalescing and both sides co-partition, so the join runs at
    exactly this width.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_equi_join supports inner/left, got {how!r}")
    on_cols = [on] if isinstance(on, str) else list(on)
    salt_src = salt_by or [c for c in left.columns if c not in on_cols]
    if salt_src:
        # NOTE: if salt_src columns are (near-)constant all left rows
        # land in one salt bucket and the salting is a no-op — pick
        # high-cardinality salt_by columns, or pass salt_by=None with a
        # join-column-only left frame to get the row-id fallback below.
        salt_expr = F.pmod(
            F.xxhash64(*[F.col(c) for c in salt_src]), F.lit(salt)
        ).cast("int")
    else:
        # left has only join columns: hash a per-row id instead —
        # xxhash64() with zero args fails at analysis, and any constant
        # would collapse the spread
        salt_expr = F.pmod(
            F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)
        ).cast("int")
    l_s = left.withColumn(SALT_COL, salt_expr)
    r_s = right.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(salt - 1))),
    )
    if num_partitions:
        part_cols = [F.col(c) for c in on_cols] + [F.col(SALT_COL)]
        l_s = l_s.repartition(num_partitions, *part_cols)
        r_s = r_s.repartition(num_partitions, *part_cols)
    l_s = l_s.alias("l")
    r_s = r_s.alias("r")
    cond = F.col(f"l.{SALT_COL}") == F.col(f"r.{SALT_COL}")
    for c in on_cols:
        cond = cond & (F.col(f"l.{c}") == F.col(f"r.{c}"))
    if extra_cond is not None:
        cond = cond & extra_cond
    out = l_s.join(r_s, cond, how)
    keep = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}").alias(c if c not in left.columns else f"{c}_r")
        for c in right.columns
        if c not in on_cols
    ]
    return out.select(*keep)


def skew_diagnostics(
    df: DataFrame,
    key_cols: Sequence[str],
    top_k: int = 20,
) -> DataFrame:
    """Heavy-hitter report for a prospective join/agg key: the top-k
    keys by row count with their corpus share and a salt-factor
    recommendation (ceil of the key's multiple of the MEAN key load —
    the sub-split S that levels that key's partition back to average).

    This is the measurement half of :func:`salted_equi_join`: at
    10^10 rows you don't guess which conv_ids are hot, you run this
    (one hash aggregation + a metadata-scale scalar join + a global
    top-k TakeOrdered — no full sort, no window) and feed the result
    into the salt choice or AQE skew thresholds. The reference has no
    notion of physical skew at all (single-threaded tables); this
    operator exists purely for the distributed recast.
    """
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("cnt"))
    stats = counts.agg(
        F.sum("cnt").alias("__total"), F.avg("cnt").alias("__mean")
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .select(
            *key_cols,
            "cnt",
            F.round(F.col("cnt") / F.col("__total"), 6).alias("share"),
            F.ceil(F.col("cnt") / F.col("__mean")).cast("int")
            .alias("salt_factor"),
        )
        .orderBy(F.col("cnt").desc(), *key_cols)
        .limit(top_k)
    )
