"""Blooms-on-write (`bloom.auto-columns` table property): every CoW
merge / compaction builds per-file Bloom filters for the named columns
over the files it just wrote, in the same commit — the membership
counterpart of stats-on-write. Without it, the first legitimate
rewrite of a bucket erases the filters analyze_bloom built and every
later file-pruned trickle merge / point lookup degrades for that
bucket (measured: bench.py --trickle-cost)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest
from pyspark.sql import functions as F, types as T

from haskell_dbfunctor_spark.lake.table import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("grp", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)


def _rows(spark, keys, tag=0):
    df = spark.createDataFrame([(int(k),) for k in keys], "k long")
    return df.select(
        "k",
        (F.col("k") % 7).cast("string").alias("grp"),
        F.sha2(F.concat(F.col("k").cast("string"), F.lit(tag)), 256).alias(
            "text"
        ),
        F.lit("U").alias("op"),
        (F.col("k") + F.lit(tag)).alias("seq"),
    )


def _mk(spark, root, **props):
    return LakeTable.create(
        spark, str(root), SCHEMA, key_cols=["k"], num_buckets=4,
        properties={
            "bloom.auto-columns": "k",
            "bloom.bits": str(1 << 16),
            "stats.auto-columns": "k",
            **{k.replace("_", "."): v for k, v in props.items()},
        },
    )


def _merge(t, df, eid, **kw):
    return t.merge(df, epoch_id=eid, order_cols=("seq",),
                   drop_cols=("seq",), **kw)


def test_merge_writes_blooms_for_written_files(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    _merge(t, _rows(spark, range(0, 4000, 2)), "seed")
    bm = t._bloom_map()
    live = [rel for fl in t.manifest["buckets"].values() for rel in fl]
    assert live and all(
        bm.get(rel, {}).get("k", {}).get("type") == "bigint" for rel in live
    )


def test_point_lookup_skips_on_write_time_blooms(spark, tmp_path):
    """read_where_eq works with NO analyze_bloom pass ever run."""
    t = _mk(spark, tmp_path / "t")
    _merge(t, _rows(spark, range(0, 4000, 2)), "seed")
    out = t.read_where_eq("k", 1000)
    assert [r.k for r in out.collect()] == [1000]
    assert t.read_where_eq("k", 1001).count() == 0


def test_pruning_survives_a_rewrite(spark, tmp_path):
    """The decay scenario blooms-on-write exists for: after a bucket's
    files are legitimately rewritten by an update, a later pure-insert
    trickle batch STILL carries them (the rewrite re-indexed its output
    in the same commit)."""
    t = _mk(spark, tmp_path / "t")
    _merge(t, _rows(spark, range(0, 8000, 2)), "seed")
    # updates of existing keys: forces real rewrites in every bucket
    _merge(t, _rows(spark, range(0, 256, 2), tag=99), "upd",
           prune_files=True)
    # pure inserts of absent odd keys: every base file's fresh bloom
    # rejects them, so every file is carried — zero rewrites
    st = _merge(t, _rows(spark, range(1, 2001, 2), tag=100), "ins",
                prune_files=True)
    assert st.extra["files_carried"] > 0
    assert st.extra["files_rewritten"] == 0
    # state is still exact
    assert t.read().count() == 4000 + 1000
    assert t.read().where(F.col("k") == 1).count() == 1


def test_compaction_refreshes_blooms(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    _merge(t, _rows(spark, range(0, 4000, 2)), "e0")
    _merge(t, _rows(spark, range(4000, 8000, 2)), "e1")
    t.compact(min_files=2)
    bm = t._bloom_map()
    live = [rel for fl in t.manifest["buckets"].values() for rel in fl]
    assert live and all(bm.get(rel, {}).get("k") for rel in live)
    st = _merge(t, _rows(spark, range(1, 1001, 2), tag=5), "ins",
                prune_files=True)
    assert st.extra["files_carried"] > 0 and st.extra["files_rewritten"] == 0


def test_auto_blooms_merge_with_analyzed_columns(spark, tmp_path):
    """A write-time patch for the auto column must not drop an
    analyze_bloom'd OTHER column on carried files, and rewritten files
    get the auto column's fresh filter."""
    t = _mk(spark, tmp_path / "t")
    _merge(t, _rows(spark, range(0, 4000, 2)), "seed")
    # second key-disjoint seed with pruning: carries e0's files, so
    # every bucket now holds TWO files (one per seed epoch)
    _merge(t, _rows(spark, range(4000, 8000, 2)), "seed2",
           prune_files=True)
    t.analyze_bloom(["grp"], bits=1 << 12)
    # update one e0 key: its file rewrites, the sibling e1 file's
    # fresh write-time bloom rejects k=2 and carries
    st = _merge(t, _rows(spark, [2], tag=9), "upd", prune_files=True)
    assert st.extra["files_carried"] > 0
    bm = t._bloom_map()
    live = [rel for fl in t.manifest["buckets"].values() for rel in fl]
    carried = [rel for rel in live if bm.get(rel, {}).get("grp")]
    rewritten = [rel for rel in live if not bm.get(rel, {}).get("grp")]
    assert carried, "carried files must keep their analyzed grp blooms"
    # every live file has the auto column's bloom regardless
    assert all(bm.get(rel, {}).get("k") for rel in live)
    assert rewritten, "the updated bucket rewrote at least one file"


def test_adaptive_bits_scale_with_file_size(spark, tmp_path):
    """bloom.bits-per-row sizes each file's filter to its row count
    (power-of-two, floored at bloom.bits): big consolidated files get
    big filters — fixed-size filters saturate as rewrites grow files
    and pruning decays. Mixed filter generations still prune in one
    probe (power-of-two masking)."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key_cols=["k"], num_buckets=2,
        properties={"bloom.auto-columns": "k", "bloom.bits": "8192",
                    "bloom.bits-per-row": "16"},
    )
    _merge(t, _rows(spark, range(0, 40000, 2)), "big")     # ~10k rows/file
    _merge(t, _rows(spark, range(40001, 40201, 2), tag=1), "small",
           prune_files=True)                               # ~50 rows/file
    bm = t._bloom_map()
    sizes = sorted({
        e["k"]["bits"] for e in bm.values() if e.get("k")
    })
    assert sizes[0] == 8192 and sizes[-1] >= (1 << 18)
    for b in sizes:
        assert b & (b - 1) == 0
    # mixed-generation probe: pure inserts carry EVERY file
    st = _merge(t, _rows(spark, range(40301, 42301, 2), tag=2), "ins",
                prune_files=True)
    assert st.extra["files_rewritten"] == 0
    assert st.extra["files_carried"] > 0


@pytest.mark.parametrize("spill", ["0", "100000000"])
def test_spilled_and_inline_regimes_agree(spark, tmp_path, spill):
    """metadata.spill-bytes=0 forces the two-level manifest from the
    first commit: bloom patches rewrite only touched buckets' scb-*
    sidecars, and lookups/pruning behave identically to inline."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key_cols=["k"], num_buckets=4,
        properties={
            "bloom.auto-columns": "k",
            "bloom.bits": str(1 << 16),
            "metadata.spill-bytes": spill,
        },
    )
    _merge(t, _rows(spark, range(0, 4000, 2)), "seed")
    t2 = LakeTable.load(spark, t.root)
    if spill == "0":
        assert t2.manifest.get("file_blooms") is None
        assert t2.manifest.get("bloom_refs")
    assert [r.k for r in t2.read_where_eq("k", 500).collect()] == [500]
    assert t2.read_where_eq("k", 501).count() == 0
    st = _merge(t2, _rows(spark, range(1, 501, 2), tag=3), "ins",
                prune_files=True)
    assert st.extra["files_carried"] > 0 and st.extra["files_rewritten"] == 0
