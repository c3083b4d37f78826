"""Bucketized range (interval) join — the scalable replacement for a
pure theta join on time predicates.

The reference evaluates EVERY theta join as an all-pairs nested loop
(/root/reference/src/RTable/Core.hs:2704-2715): a point-in-interval
join over N windows and M points costs O(N*M) there. Spark's own
fallback for a non-equi condition is BroadcastNestedLoopJoin (fine
when one side is tiny) or a cartesian product (never fine). This
module rewrites the range predicate into an EQUI join on a coarse
time-bucket key:

- each point lands in exactly ONE bucket: floor(ts / bucket),
- each window explodes to the (few) buckets it overlaps via
  ``sequence(floor(start/bucket), floor(end/bucket))``,
- equi-join on the bucket key (shuffle hash / SMJ — Catalyst's
  choice), then re-check the exact predicate inside the join.

Because a point has one bucket and window bucket lists are distinct,
every qualifying (window, point) pair is produced exactly once — no
post-join dedup. Cost is O((N*ceil(w/bucket) + M) shuffle) + true
matches, instead of N*M. ``bucket_s`` should be ~the window length:
windows then explode to <= 2 buckets and each point is compared only
against windows within +-1 bucket.

At 100 TB both sides shuffle-partition on the bucket key; hot buckets
(bursty hours) can additionally be salted with
operators/skew.py:salted_equi_join by passing the exploded frames
through it — the key shape (one equi column) is identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _micros(col: Column) -> Column:
    """Microsecond instant for bucketing. Driver parquet carries
    TIMESTAMP_NTZ (TESTDATA.md / CLAUDE.md gotcha), which unix_micros
    rejects — cast through session-tz TIMESTAMP. Both sides shift by
    the same offset so bucket alignment is preserved; with a
    fixed-offset session tz (default UTC in this sandbox) the mapping
    is also DST-proof. The EXACT range predicate compares the raw
    (uncast) columns, so match correctness never depends on the tz."""
    return F.unix_micros(col.cast("timestamp"))


def bucketized_range_join(
    windows: DataFrame,
    points: DataFrame,
    *,
    w_start: str,
    w_end: str,
    p_ts: str,
    bucket_s: int = 3600,
    equi_cols: list[str] | None = None,
    extra_cond: Column | None = None,
) -> DataFrame:
    """Inner-join ``points`` rows whose ``p_ts`` falls in ``[w_start,
    w_end)`` of ``windows`` rows, via a bucket equi-join.

    Timestamps are compared at microsecond precision (``unix_micros``)
    so sub-second event times bucket and compare exactly. Column name
    collisions between the two sides get a ``_p`` suffix on the point
    side (the reference's ``_1`` collision convention, Core.hs:93-104
    analog). ``equi_cols`` (present on both sides, e.g. user_id) join
    as additional EQUI keys — they enter the shuffle key alongside the
    bucket, so per-user windows co-partition with per-user points.
    Inner only: a window exploded to 2 buckets would emit 2 unmatched
    rows under a left join; callers wanting zero-match windows
    aggregate the pairs and left-join the window table to the
    aggregate (see __spark_entry__ q83).
    """
    bucket_us = F.lit(int(bucket_s) * 1_000_000)
    wb = windows.withColumn(
        "__rj_buckets",
        F.sequence(
            F.floor(_micros(F.col(w_start)) / bucket_us),
            # end is EXCLUSIVE: a window ending exactly on a bucket
            # edge does not overlap that bucket
            F.floor((_micros(F.col(w_end)) - 1) / bucket_us),
        ),
    ).withColumn("__rj_b", F.explode("__rj_buckets")).drop("__rj_buckets")
    pb = points.withColumn(
        "__rj_b", F.floor(_micros(F.col(p_ts)) / bucket_us)
    )
    # disambiguate colliding point-side columns (suffix _p)
    collide = set(wb.columns) & (set(pb.columns) - {"__rj_b"})
    for c in collide:
        pb = pb.withColumnRenamed(c, f"{c}_p")
    p_ts_out = f"{p_ts}_p" if p_ts in collide else p_ts
    cond = (
        (wb["__rj_b"] == pb["__rj_b"])
        & (pb[p_ts_out] >= wb[w_start])
        & (pb[p_ts_out] < wb[w_end])
    )
    for c in equi_cols or []:
        c_p = f"{c}_p" if c in collide else c
        cond = cond & (wb[c] == pb[c_p])
    if extra_cond is not None:
        cond = cond & extra_cond
    return wb.join(pb, cond, "inner").drop("__rj_b")
