"""Catalog-level consistent tags (lake/transaction.py:Catalog.tag):
one durable name pins a tear-free cross-table read point; per-table
``cat-<name>`` refs shield the pinned versions from expire_snapshots;
deletion re-opens them."""
import shutil
import uuid

import pytest
from pyspark.sql import functions as F, types as T

from haskell_dbfunctor_spark.lake.table import LakeError, LakeTable
from haskell_dbfunctor_spark.lake.transaction import Catalog

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.DoubleType()),
])


@pytest.fixture()
def root(tmp_path):
    d = str(tmp_path / f"ctag_{uuid.uuid4().hex[:6]}")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _merge(spark, t, lo, hi, val):
    t.merge(
        spark.range(lo, hi).select(
            F.col("id").alias("k"), F.lit(val).alias("v"),
            F.lit("U").alias("op"),
        ),
        order_cols=("k",), drop_cols=(),
    )


def _mk(spark, root):
    cat = Catalog(spark, f"{root}/cat")
    a = LakeTable.create(spark, f"{root}/a", SCHEMA, ["k"], num_buckets=2)
    b = LakeTable.create(spark, f"{root}/b", SCHEMA, ["k"], num_buckets=2)
    _merge(spark, a, 0, 10, 1.0)
    _merge(spark, b, 0, 5, 1.0)
    return cat, a, b


def test_tag_pins_cross_table_state(spark, root):
    cat, a, b = _mk(spark, root)
    rec = cat.tag("run1", [a.root, b.root])
    assert set(rec["tables"].values()) == {1}
    # later writes do not move the tag
    _merge(spark, a, 0, 10, 99.0)
    _merge(spark, b, 5, 9, 99.0)
    pinned = cat.load_tag("run1")
    for t in pinned.values():
        assert t.read().where(F.col("v") == 99.0).count() == 0
    assert {t.version for t in pinned.values()} == {1}
    assert cat.tags() == ["run1"]


def test_tag_survives_expiry(spark, root):
    cat, a, b = _mk(spark, root)
    cat.tag("keep", [a.root, b.root])
    for _ in range(3):
        _merge(spark, a, 0, 10, 7.0)
    a.expire_snapshots(keep_last=1)
    pinned = cat.load_tag("keep")
    ta = pinned[next(r for r in pinned if r.endswith("/a"))]
    assert ta.version == 1
    assert ta.read().where(F.col("v") != 1.0).count() == 0


def test_duplicate_tag_refused_and_refs_rolled_back(spark, root):
    cat, a, b = _mk(spark, root)
    cat.tag("x", [a.root, b.root])
    with pytest.raises(LakeError):
        cat.tag("x", [a.root, b.root])
    # the failed attempt must not leave stray per-table refs: deleting
    # then re-tagging works, and exactly one cat-x ref per table exists
    rec = cat.delete_tag("x")
    assert set(rec["tables"].values()) == {1}
    _merge(spark, a, 0, 3, 2.0)
    rec2 = cat.tag("x", [a.root, b.root])
    assert rec2["tables"][next(
        r for r in rec2["tables"] if r.endswith("/a")
    )] == 2
    with pytest.raises(LakeError):
        cat.delete_tag("nope")


def test_tag_name_validation(spark, root):
    cat, a, b = _mk(spark, root)
    with pytest.raises(LakeError, match="invalid"):
        cat.tag("bad/name", [a.root])
