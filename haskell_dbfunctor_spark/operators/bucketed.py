"""Bucketed tables: shuffle-free co-located joins.

The reference joins are in-memory nested loops; at 100 TB the dominant
join cost is the SHUFFLE, not the probe. For join keys used repeatedly
(fact-to-fact joins on conv_id, repeated dedup passes), persisting both
sides bucketed by the same key into the same bucket count lets every
subsequent equi-join run with ZERO Exchange: each task reads matching
buckets from both sides (Spark native bucketing; the storage-layout
counterpart of lake.LakeTable's hash buckets, here registered in the
catalog so Catalyst can prove co-partitioning).

tests/test_bucketed_join.py asserts the plan is literally Exchange-free
and agrees with the shuffled join.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    name: str,
    key_cols: Sequence[str],
    buckets: int,
    *,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table bucketed (and by default
    sorted) by ``key_cols`` — one-time shuffle now, none on every
    later join/aggregation over the key. ``sort=True`` additionally
    removes the per-task Sort from later sort-merge joins."""
    w = df.write.format("parquet").mode(mode).bucketBy(buckets, *key_cols)
    if sort:
        w = w.sortBy(*key_cols)
    w.saveAsTable(name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
    *,
    force_sort_merge: bool = False,
) -> DataFrame:
    """Equi-join two same-key same-bucket-count tables. Catalyst sees
    both sides' bucket specs and plans the join without any shuffle
    Exchange; the caller is responsible for having bucketed both tables
    on the join key with equal bucket counts.

    When one side is small Spark may still prefer a broadcast (which
    ignores bucketing — fine, broadcasts don't shuffle either);
    ``force_sort_merge=True`` pins the bucket-to-bucket SMJ, the plan
    that stays shuffle-free when BOTH sides are 100 TB-large."""
    lhs = spark.table(left_table)
    if force_sort_merge:
        lhs = lhs.hint("merge")
    return lhs.join(spark.table(right_table), list(on), how)
