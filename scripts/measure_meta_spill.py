"""Measure per-commit metadata bytes: inline vs two-level manifest.

Builds the same bloom-bearing table twice (inline-forced vs
spill-forced), then applies a single-key merge and reports how many
metadata bytes the commit wrote (manifest + NEW sidecars). This is the
number that turns into the 100 TB bottleneck: inline manifests rewrite
the full file listing + every bloom bitset on EVERY commit; the
two-level layout rewrites only the touched bucket's sidecar.

Usage: python scripts/measure_meta_spill.py [num_buckets] [rows]
"""

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.types as T  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from haskell_dbfunctor_spark.session import get_spark  # noqa: E402
from haskell_dbfunctor_spark.lake.table import (  # noqa: E402
    MANIFEST_DIR,
    LakeTable,
)

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
])


def _meta_files(root):
    meta = os.path.join(root, MANIFEST_DIR)
    return {
        f: os.path.getsize(os.path.join(meta, f))
        for f in os.listdir(meta)
        if f.endswith(".json")
    }


def build(spark, root, props, num_buckets, rows):
    t = LakeTable.create(
        spark, root, SCHEMA, key_cols=["k"], num_buckets=num_buckets,
        properties=props,
    )
    big = spark.range(rows).select(
        F.col("id").alias("k"),
        F.concat(F.lit("v"), F.col("id")).alias("v"),
    )
    t.merge(big, epoch_id="bulk", op_col=None, order_cols=())
    t.analyze_bloom(["k"])
    before = _meta_files(root)
    t.merge(
        spark.createDataFrame([(0, "w0")], "k long, v string"),
        epoch_id="point", op_col=None, order_cols=(),
    )
    after = _meta_files(root)
    new_bytes = sum(sz for f, sz in after.items() if f not in before)
    manifest_sz = after[f"v{t.version}.json"]
    return {
        "commit_meta_bytes_written": new_bytes,
        "head_manifest_bytes": manifest_sz,
        "total_meta_files": len(after),
    }


def main():
    num_buckets = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    base = tempfile.mkdtemp(prefix="meta_spill_", dir="/dev/shm")
    try:
        inline = build(
            spark, os.path.join(base, "inline"),
            {"metadata.spill-bytes": str(1 << 40)}, num_buckets, rows,
        )
        spilled = build(
            spark, os.path.join(base, "spilled"),
            {"metadata.spill-bytes": "0"}, num_buckets, rows,
        )
        print(json.dumps({
            "num_buckets": num_buckets,
            "rows": rows,
            "inline": inline,
            "spilled": spilled,
            "commit_bytes_ratio": round(
                inline["commit_meta_bytes_written"]
                / max(spilled["commit_meta_bytes_written"], 1), 1
            ),
        }))
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
