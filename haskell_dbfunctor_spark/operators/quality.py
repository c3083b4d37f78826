"""Table-level data-quality census operators.

Extensions beyond the reference (whose closest surface is per-row
predicate machinery, ``/root/reference/src/RTable/Core.hs`` RPredicate
filters): the health checks a large ingest pipeline runs after every
load —

* referential integrity: FK orphan discovery/counting via anti-joins
  (SQL FK semantics: a NULL FK never violates);
* freshness: per-group event-time lag against the table's global
  high-water mark (one hash agg + a 1-row cross join Spark broadcasts
  for free);
* column profiling: null rate / exact NDV / min / max for every
  column in ONE scan (multi-distinct aggs use Catalyst's Expand — one
  pass over the data, no per-column rescans).

Scale notes (100 TB posture): every operator here is a pure
aggregation/anti-join plan — no driver-side collects, no Python UDFs,
no windows without partition keys. The FK anti-joins shuffle on the
key unless the parent is broadcastable; callers with dim-sized
parents should pass them through ``F.broadcast`` themselves (the
census takes DataFrames, so the hint composes).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def fk_orphans(
    child: DataFrame,
    parent: DataFrame,
    on: str | Sequence[str],
    parent_on: str | Sequence[str] | None = None,
) -> DataFrame:
    """Child rows whose FK points at no parent row (NULL FKs pass).

    ``on``: FK column(s) in ``child``; ``parent_on``: the referenced
    key column(s) in ``parent`` (defaults to ``on``). Plan: filter the
    NULL FKs out (a NULL never violates a FOREIGN KEY), then one
    LEFT ANTI equi-join — no data moves back to the driver.
    """
    fk = [on] if isinstance(on, str) else list(on)
    pk = fk if parent_on is None else (
        [parent_on] if isinstance(parent_on, str) else list(parent_on)
    )
    if len(fk) != len(pk):
        raise ValueError("on and parent_on must have the same arity")
    non_null = child
    for c in fk:
        non_null = non_null.filter(F.col(c).isNotNull())
    cond = [non_null[f] == parent[p] for f, p in zip(fk, pk)]
    return non_null.join(parent, cond, "left_anti")


def referential_integrity_census(
    pairs: Sequence[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """One row per declared FK: child rows, non-null FKs, orphans.

    ``pairs``: ``(constraint_name, child_df, fk_col, parent_df,
    pk_col)``. Output: ``constraint, n_child, n_fk_non_null,
    n_orphans`` — the post-load referential-health dashboard. Each
    constraint is two tiny aggregate plans (a full-child count and an
    anti-join count) cross-joined into one row; constraints union
    into one frame, so the whole census is a single action downstream.
    """
    legs = []
    for name, child, fk, parent, pk in pairs:
        totals = child.agg(
            F.count(F.lit(1)).alias("n_child"),
            F.count(F.col(fk)).alias("n_fk_non_null"),
        )
        orphans = fk_orphans(child, parent, fk, pk).agg(
            F.count(F.lit(1)).alias("n_orphans")
        )
        legs.append(
            totals.crossJoin(orphans)
            .select(
                F.lit(name).alias("constraint"),
                "n_child",
                "n_fk_non_null",
                "n_orphans",
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


def freshness_lag(
    df: DataFrame,
    group_cols: str | Sequence[str],
    ts_col: str,
    *,
    stale_after_minutes: float | None = None,
) -> DataFrame:
    """Per-group event-time high-water mark vs the global one.

    Output: group cols + ``group_max_ts``, ``global_max_ts``,
    ``lag_minutes`` (how far the group trails the freshest data), and
    ``is_stale`` when ``stale_after_minutes`` is given — the feed
    liveness dashboard for a multi-source ingest. Plan: one hash agg
    per group, one global agg, and a 1-row cross join (Spark
    broadcasts the single-row side; no window over the whole table).
    """
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    per_group = df.groupBy(*groups).agg(
        F.max(ts_col).alias("group_max_ts")
    )
    global_max = df.agg(F.max(ts_col).alias("global_max_ts"))
    # unix_micros rejects TIMESTAMP_NTZ (what parquet event-time columns
    # often carry) — cast both marks identically so the difference is
    # timezone-invariant either way
    out = per_group.crossJoin(F.broadcast(global_max)).withColumn(
        "lag_minutes",
        (
            F.unix_micros(F.col("global_max_ts").cast("timestamp"))
            - F.unix_micros(F.col("group_max_ts").cast("timestamp"))
        ).cast("double")
        / F.lit(60_000_000.0),
    )
    if stale_after_minutes is not None:
        out = out.withColumn(
            "is_stale", F.col("lag_minutes") > F.lit(float(stale_after_minutes))
        )
    return out


def profile_columns(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    *,
    approx_ndv: bool = False,
) -> DataFrame:
    """Column-level profile in ONE scan: one output row per column.

    Output: ``column, n_rows, n_nulls, null_rate, n_distinct,
    min_value, max_value`` (min/max cast to string so heterogeneous
    column types stack into one frame). Exact ``count(DISTINCT)`` per
    column rides Catalyst's Expand operator — a single pass that
    replicates each input row once per distinct aggregate, which is
    the standard multi-distinct plan; at extreme widths (hundreds of
    columns × 100 TB) pass ``approx_ndv=True`` to swap in HLL
    ``approx_count_distinct`` and keep the scan replica-free.
    """
    names = list(cols) if cols is not None else list(df.columns)
    ndv = (
        F.approx_count_distinct if approx_ndv else F.countDistinct
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in names:
        aggs.append(F.count(F.col(c)).alias(f"__nn_{c}"))
        aggs.append(ndv(F.col(c)).alias(f"__ndv_{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__max_{c}"))
    one = df.agg(*aggs)
    per_col = F.explode(
        F.array(*[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"__nn_{c}").alias("n_non_null"),
                F.col(f"__ndv_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_value"),
                F.col(f"__max_{c}").alias("max_value"),
            )
            for c in names
        ])
    ).alias("p")
    return one.select(F.col("__n").alias("n_rows"), per_col).select(
        "p.column",
        "n_rows",
        (F.col("n_rows") - F.col("p.n_non_null")).alias("n_nulls"),
        F.when(F.col("n_rows") > 0,
               (F.col("n_rows") - F.col("p.n_non_null"))
               / F.col("n_rows").cast("double"))
        .otherwise(F.lit(0.0))
        .alias("null_rate"),
        F.col("p.n_distinct").alias("n_distinct"),
        F.col("p.min_value").alias("min_value"),
        F.col("p.max_value").alias("max_value"),
    )
