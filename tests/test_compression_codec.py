"""write.compression-codec table property.

The codec rides per-file parquet metadata, so mixing codecs within one
table (set mid-stream) must stay readable, every write path must honor
the property, and rewrites must migrate bytes to the current codec.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq
import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.lake.table import LakeError, LakeTable

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
])


def _batch(spark, rows, op="U"):
    return spark.createDataFrame(rows, "k long, v string").withColumn(
        "op", F.lit(op)
    )


def _codecs_under(t):
    """Distinct parquet codecs over the table's LIVE files (base +
    MoR delta + DV) — superseded snapshot dirs linger until
    expire_snapshots and keep their old codec by design."""
    files = list(t._files()) + list(t._delta_files())
    for refs in (t.manifest.get("dv_files") or {}).values():
        files.extend(os.path.join(t.root, r) for r in refs)
    out = set()
    for f in files:
        md = pq.ParquetFile(f).metadata
        out.add(md.row_group(0).column(0).compression.lower())
    return out


def test_codec_on_create_and_reads(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key_cols=["k"], num_buckets=2,
        properties={"write.compression-codec": "zstd"},
    )
    t.merge(_batch(spark, [(i, f"v{i}") for i in range(20)]), epoch_id="e1",
            order_cols=("k",), drop_cols=())
    assert _codecs_under(t) == {"zstd"}
    assert t.read().count() == 20


def test_mixed_codecs_stay_readable_and_compact_migrates(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key_cols=["k"], num_buckets=8,
    )
    t.merge(_batch(spark, [(i, f"a{i}") for i in range(40)]), epoch_id="e1",
            order_cols=("k",), drop_cols=())
    assert _codecs_under(t) == {"snappy"}
    t.set_properties({"write.compression-codec": "zstd"})
    # single-key merge: only ITS bucket rewrites to zstd; the other
    # buckets keep their snappy files (CoW rewrites touched buckets)
    t.merge(_batch(spark, [(0, "patched")]), epoch_id="e2",
            order_cols=("k",), drop_cols=())
    assert _codecs_under(t) == {"snappy", "zstd"}
    assert t.read().count() == 40
    # a full rewrite migrates every surviving byte to the current codec
    t.rebucket(8)
    assert _codecs_under(t) == {"zstd"}
    assert t.read().count() == 40


def test_mor_deltas_and_dv_honor_codec(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key_cols=["k"], num_buckets=2,
        properties={"write.compression-codec": "gzip"},
    )
    t.merge(_batch(spark, [(i, f"a{i}") for i in range(10)]), epoch_id="e1",
            order_cols=("k",), drop_cols=())
    t.merge(_batch(spark, [(3, "patched")]), epoch_id="e2", mode="mor",
            order_cols=("k",), drop_cols=())
    t.delete_where(F.col("k") == 7, mode="dv")
    assert _codecs_under(t) == {"gzip"}
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got[3] == "patched" and 7 not in got


def test_invalid_codec_rejected(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key_cols=["k"], num_buckets=2,
    )
    with pytest.raises(LakeError, match="compression-codec"):
        t.set_properties({"write.compression-codec": "lzma"})


def test_invalid_codec_rejected_at_create_and_cli(spark, tmp_path):
    """ADVICE r03: a typo'd codec must fail loudly at create(properties=)
    and at cdc_ingest --codec — never silently degrade to snappy."""
    with pytest.raises(LakeError, match="compression-codec"):
        LakeTable.create(
            spark, str(tmp_path / "bad"), SCHEMA, key_cols=["k"],
            num_buckets=2, properties={"write.compression-codec": "zsdt"},
        )
    # CLI arg-parse path (covers the existing-table case where create()
    # never runs): argparse .error exits with SystemExit(2)
    import jobs.cdc_ingest as ci
    with pytest.raises(SystemExit):
        ci.main(["--table-root", str(tmp_path / "t2"),
                 "--epochs", "1", "--codec", "zsdt"])
