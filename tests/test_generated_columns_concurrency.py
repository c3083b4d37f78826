"""Generated-column invariant under optimistic concurrency: racing
merges (same table, disjoint and overlapping keys) re-execute or
rebase through the CAS loop, and EVERY surviving row still satisfies
g == expr(row) — the recompute is part of the merge projection, so no
interleaving can commit a stale generated value."""
import shutil
import threading
import uuid

import pytest
from pyspark.sql import functions as F, types as T

from haskell_dbfunctor_spark.lake.table import LakeTable

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.DoubleType()),
    T.StructField("band", T.StringType()),
])

GEN = {"band": "CASE WHEN v >= 100 THEN 'high' ELSE 'low' END"}


@pytest.fixture()
def root(tmp_path):
    d = str(tmp_path / f"gcc_{uuid.uuid4().hex[:6]}")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_invariant_survives_racing_merges(spark, root):
    t0 = LakeTable.create(
        spark, root, SCHEMA, ["k"], num_buckets=4,
        generated_columns=GEN,
    )
    seed = spark.range(40).select(
        F.col("id").alias("k"), (F.col("id") * 10.0).alias("v"),
        F.lit("U").alias("op"),
    )
    t0.merge(seed, epoch_id="seed", order_cols=("k",), drop_cols=())

    errs = []

    def writer(wid: int):
        try:
            h = LakeTable.load(spark, root)
            batch = spark.range(wid * 10, wid * 10 + 25).select(
                F.col("id").alias("k"),
                (F.col("id") * 10.0 + wid).alias("v"),
                F.lit("U").alias("op"),
            )
            h.merge(batch, epoch_id=f"w{wid}", order_cols=("k",),
                    drop_cols=(), conflict_retries=10)
        except Exception as e:  # surface, don't swallow
            errs.append((wid, repr(e)))

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(3)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs

    final = LakeTable.load(spark, root)
    # every writer's epoch landed exactly once
    applied = set(final.manifest["applied_epochs"])
    assert {"seed", "w0", "w1", "w2"} <= applied
    # THE invariant: zero rows where band != expr(v)
    bad = final.read().where(
        F.col("band")
        != F.when(F.col("v") >= 100, F.lit("high")).otherwise(F.lit("low"))
    )
    assert bad.count() == 0
