"""Stream-stream interval join: matched pairs equal the batch interval
join, and state eviction past the watermark drops late matches (same
batch-commit watermark mechanics the windowed-agg tests pin).
"""

import os
import sys
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.types as T
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.streaming.joins import drain_interval_join

L_SCHEMA = T.StructType([
    T.StructField("user_id", T.StringType()),
    T.StructField("view_id", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])
R_SCHEMA = T.StructType([
    T.StructField("user_id", T.StringType()),
    T.StructField("click_id", T.StringType()),
    T.StructField("c_ts", T.TimestampType()),
])


def _mk_dir(tmp_path, name):
    d = str(tmp_path / name)
    os.makedirs(d)
    return d


def _seg(spark, tmp_path, dirpath, rows, schema, name, mtime):
    df = spark.createDataFrame(rows, schema)
    staging = str(tmp_path / f"stage_{name}")
    df.coalesce(1).write.parquet(staging)
    src = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
    dst = os.path.join(dirpath, f"{name}.parquet")
    os.rename(os.path.join(staging, src), dst)
    os.utime(dst, (mtime, mtime))


def _t(minute):
    return datetime(2025, 3, 1, minute // 60, minute % 60)


def test_pairs_match_batch_semantics(spark, tmp_path):
    left = _mk_dir(tmp_path, "views")
    right = _mk_dir(tmp_path, "clicks")
    import time as _time

    t0 = _time.time()
    lrows = [
        ("u1", "v1", _t(0)),
        ("u1", "v2", _t(30)),
        ("u2", "v3", _t(5)),
    ]
    rrows = [
        ("u1", "c1", _t(4)),    # within v1+10m
        ("u1", "c2", _t(12)),   # outside v1's window, before v2
        ("u1", "c3", _t(33)),   # within v2+10m
        ("u2", "c4", _t(3)),    # BEFORE v3 (v3@5) -> no pair
        ("u2", "c5", _t(9)),    # within v3+10m
        ("u3", "c6", _t(1)),    # no matching view
    ]
    _seg(spark, tmp_path, left, lrows, L_SCHEMA, "l-000", t0)
    _seg(spark, tmp_path, right, rrows, R_SCHEMA, "r-000", t0)
    got = drain_interval_join(
        spark, left, L_SCHEMA, right, R_SCHEMA,
        str(tmp_path / "out"),
        keys=["user_id"], left_ts="ts", right_ts="c_ts",
        upper="10 minutes", watermark="0 seconds",
    )
    pairs = sorted(
        (r["view_id"], r["click_id"]) for r in got.collect()
    )
    assert pairs == [("v1", "c1"), ("v2", "c3"), ("v3", "c5")]
    # batch-mode cross-check: same condition as a plain join
    l = spark.createDataFrame(lrows, L_SCHEMA)
    r = spark.createDataFrame(rrows, R_SCHEMA)
    want = sorted(
        (x["view_id"], x["click_id"])
        for x in l.join(r, "user_id")
        .where(
            (F.col("c_ts") >= F.col("ts"))
            & (F.col("c_ts") <= F.expr("ts + INTERVAL 10 minutes"))
        )
        .collect()
    )
    assert pairs == want


def test_watermark_evicts_left_state(spark, tmp_path):
    """A right-side match arriving AFTER the watermark passed the left
    row's interval produces no pair. Measured mechanics (same as the
    windowed-agg pins in CLAUDE.md): batch N's watermark derives from
    batches < N and STATE EVICTION applies at batch N's COMMIT — so a
    match one batch after the time-advancer still pairs (v1 evicts
    only at that batch's commit); the drop needs the match TWO batches
    after the advancer."""
    import time as _time

    left = _mk_dir(tmp_path, "views")
    right = _mk_dir(tmp_path, "clicks")
    t0 = _time.time()
    # batch 0: the left row + a right-side time-advancer (no match)
    _seg(spark, tmp_path, left, [("u1", "v1", _t(0))], L_SCHEMA,
         "l-000", t0)
    _seg(spark, tmp_path, right, [("zz", "c0", _t(0))], R_SCHEMA,
         "r-000", t0)
    # batch 1: both sides jump to t=500min -> next watermark ~490min
    _seg(spark, tmp_path, left, [("zz", "v9", _t(500))], L_SCHEMA,
         "l-001", t0 + 1)
    _seg(spark, tmp_path, right, [("zz", "c9", _t(500))], R_SCHEMA,
         "r-001", t0 + 1)
    # batch 2: more advancers; its COMMIT evicts v1 (wm from batch 1)
    _seg(spark, tmp_path, right, [("zz", "c10", _t(501))], R_SCHEMA,
         "r-002", t0 + 2)
    _seg(spark, tmp_path, left, [("zz", "v10", _t(501))], L_SCHEMA,
         "l-002", t0 + 2)
    # batch 3: a right row that WOULD match v1 (in [0, 10m]) — state
    # is gone, no pair
    _seg(spark, tmp_path, right, [("u1", "c1", _t(4))], R_SCHEMA,
         "r-003", t0 + 3)
    _seg(spark, tmp_path, left, [("zz", "v11", _t(502))], L_SCHEMA,
         "l-003", t0 + 3)
    got = drain_interval_join(
        spark, left, L_SCHEMA, right, R_SCHEMA,
        str(tmp_path / "out"),
        keys=["user_id"], left_ts="ts", right_ts="c_ts",
        upper="10 minutes", watermark="10 minutes",
        max_files_per_trigger=1,
    )
    assert not [
        r for r in got.collect() if r["view_id"] == "v1"
    ]
