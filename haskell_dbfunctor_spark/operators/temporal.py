"""Temporal operators: point-in-time (as-of) join, sessionization, and
time-range rolling aggregates.

Neither exists in the reference (its join surface is the six theta
joins, /root/reference/src/RTable/Core.hs:2704-2715); both are
first-class extensions for the event/CDC domain this engine targets
(north rule): an as-of join is the point-in-time lookup every feature
pipeline over a change feed needs, and sessionization is the standard
gaps-and-islands windowing over event streams.

Scale posture (the 100 TB question):

- ``asof_join`` is the union-tag + running ``last_value`` plan: tag the
  two inputs, union them, ONE hash shuffle on the equality keys, ONE
  per-key sort, and a running ``last(right_payload, ignorenulls)``
  window. No range-explode join, no per-left-row right-side scan —
  cost is sort-merge-shaped (the same strategy DuckDB/Polars use for
  ASOF). A pathologically hot key serializes into one task, as any
  keyed window does; pre-split such keys upstream if per-key volume
  exceeds a task.
- ``sessionize`` is lag + running sum over one (key, ts) sort: the two
  window functions share partitioning and ordering, so Catalyst plans
  ONE Exchange + ONE Sort with stacked Window nodes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str | None = None,
    *,
    right_cols: list[str] | None = None,
    allow_exact_match: bool = True,
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_ts <= left_ts`` (``< left_ts`` when ``allow_exact_match``
    is False) sharing the equality keys ``on``. Left join semantics:
    left rows with no prior right row keep NULL payload columns.

    ``right_cols`` limits the attached payload (default: every right
    column except the keys and the timestamp). Colliding payload names
    get ``suffix``. When several right rows share (key, ts) the
    attached one is arbitrary among them — dedupe the right side first
    (e.g. LWW max_by) for deterministic output.
    """
    on_cols = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in {*on_cols, right_ts}]
    left_keep = [c for c in left.columns if c not in on_cols and c != left_ts]

    # right rows must sort BEFORE a left row at equal ts to be visible
    # to it under inclusive match; after it under exclusive match
    right_side = 0 if allow_exact_match else 2
    l2 = left.select(
        *on_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *left_keep,
    )
    r2 = right.select(
        *on_cols,
        F.col(right_ts).alias("__ts"),
        F.lit(right_side).alias("__side"),
        F.struct(*right_cols).alias("__rpay"),
    )
    u = l2.unionByName(r2, allowMissingColumns=True)

    w = (
        Window.partitionBy(*on_cols)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    att = u.withColumn("__att", F.last("__rpay", ignorenulls=True).over(w))

    taken = set(on_cols) | {left_ts} | set(left_keep)
    out_cols = [F.col(c) for c in on_cols]
    out_cols.append(F.col("__ts").alias(left_ts))
    out_cols += [F.col(c) for c in left_keep]
    for c in right_cols:
        name = c + suffix if c in taken else c
        out_cols.append(F.col(f"__att.{c}").alias(name))
    return att.where(F.col("__side") == 1).select(*out_cols)


def rolling_range_agg(
    df: DataFrame,
    key_cols: str | list[str],
    ts_col: str,
    aggs: dict[str, Column] | None = None,
    window_seconds: float = 3600.0,
    *,
    value_col: str = "value",
    out_col: str = "rolling_sum",
) -> DataFrame:
    """Time-RANGE rolling aggregate: for every row, aggregate the rows
    of the same key whose timestamp lies in ``[ts - window_seconds,
    ts]`` — the trailing-window feature every event-stream pipeline
    derives (rate limits, rolling spend, burst detection). A rows-frame
    (``rtabFoldl'``-style running totals, operators/core.py
    running_total) cannot express this: the frame width varies per row
    with event density.

    ``aggs`` maps output column name -> aggregate Column (default: one
    SUM over ``value_col`` named ``out_col``). Plan: ONE hash exchange
    on the key + ONE sort, then a RangeFrame window over
    ``unix_micros(ts)`` — no self-join, no interval explode; SQL RANGE
    BETWEEN INTERVAL semantics (ties in ts are peers: every row with
    equal ts sees the identical frame, matching ANSI/DuckDB). Skew
    caveat matches ``asof_join``: one key sorts in one task.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if aggs is None:
        aggs = {out_col: F.sum(F.col(value_col))}
    span_us = int(round(window_seconds * 1_000_000))
    # cast: driver parquet carries TimestampNTZ, unix_micros wants
    # TIMESTAMP (wall-clock preserving under the UTC session TZ)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.unix_micros(F.col(ts_col).cast("timestamp")))
        .rangeBetween(-span_us, 0)
    )
    out = df
    for name, agg in aggs.items():
        out = out.withColumn(name, agg.over(w))
    return out


def sessionize(
    df: DataFrame,
    key_cols: str | list[str],
    ts_col: str,
    gap_seconds: float,
    *,
    tiebreak_cols: list[str] | None = None,
    out_col: str = "session_idx",
) -> DataFrame:
    """Gaps-and-islands sessionization: rows of the same key whose
    consecutive timestamps are within ``gap_seconds`` share a session;
    ``out_col`` numbers sessions 1..n per key in time order.

    ``tiebreak_cols`` pin a total order when timestamps can collide
    (required for deterministic session boundaries on tied rows).
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    tb = tiebreak_cols or []
    order = [F.col(ts_col), *[F.col(c) for c in tb]]
    w = Window.partitionBy(*keys).orderBy(*order)
    gap_us = int(round(gap_seconds * 1_000_000))  # round: 0.29s is 290000us
    prev = F.lag(F.col(ts_col)).over(w)
    flag = F.when(
        prev.isNull()
        | (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev) > F.lit(gap_us)),
        F.lit(1),
    ).otherwise(F.lit(0))
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        df.withColumn("__new_sess", flag)
        .withColumn(out_col, F.sum("__new_sess").over(w_run))
        .drop("__new_sess")
    )
