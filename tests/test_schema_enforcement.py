"""schema.auto-evolve table property (lake/table.py:_evolve_schema):
"false" = Delta-style schema enforcement — merge batches may not
implicitly add or widen columns; explicit add_column stays sanctioned;
flipping the property back re-enables the default auto-evolution."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.lake.table import LakeError, LakeTable

SCHEMA = T.StructType([
    T.StructField("k", T.LongType(), False),
    T.StructField("v", T.IntegerType(), True),
])


def _batch(spark, cols="k long, v int, op string, seq long", rows=None):
    rows = rows or [(1, 10, "U", 0), (2, 20, "U", 1)]
    return spark.createDataFrame(rows, cols)


def _create(spark, tmp_path, **kw):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key_cols=["k"],
        num_buckets=2, **kw,
    )
    t.merge(_batch(spark), op_col="op", order_cols=("seq",),
            drop_cols=("seq",))
    return t


def test_enforcement_rejects_new_column(spark, tmp_path):
    t = _create(
        spark, tmp_path, properties={"schema.auto-evolve": "false"}
    )
    bad = _batch(
        spark, "k long, v int, extra string, op string, seq long",
        [(3, 30, "oops", "U", 2)],
    )
    with pytest.raises(LakeError, match="auto-evolve.*extra"):
        t.merge(bad, op_col="op", order_cols=("seq",), drop_cols=("seq",))
    # nothing committed
    assert t.read().count() == 2
    assert [f.name for f in t.schema.fields] == ["k", "v"]


def test_enforcement_rejects_widening(spark, tmp_path):
    t = _create(
        spark, tmp_path, properties={"schema.auto-evolve": "false"}
    )
    wide = _batch(spark, "k long, v long, op string, seq long",
                  [(3, 2**40, "U", 2)])
    with pytest.raises(LakeError, match="auto-evolve.*widen"):
        t.merge(wide, op_col="op", order_cols=("seq",),
                drop_cols=("seq",))
    assert t.schema["v"].dataType == T.IntegerType()


def test_enforcement_allows_same_shape_and_explicit_ddl(spark, tmp_path):
    t = _create(
        spark, tmp_path, properties={"schema.auto-evolve": "false"}
    )
    # same-schema batches merge fine under enforcement
    t.merge(_batch(spark, rows=[(3, 30, "U", 2)]), op_col="op",
            order_cols=("seq",), drop_cols=("seq",))
    assert t.read().count() == 3
    # explicit DDL is the sanctioned evolution path
    t.add_column("note", "string", default="n/a")
    got = t.merge(
        _batch(
            spark, "k long, v int, note string, op string, seq long",
            [(4, 40, "hi", "U", 3)],
        ),
        op_col="op", order_cols=("seq",), drop_cols=("seq",),
    )
    assert not got.skipped
    assert (
        t.read().where(F.col("k") == 1).select("note").first()[0] == "n/a"
    )


def test_property_flip_restores_auto_evolution(spark, tmp_path):
    t = _create(
        spark, tmp_path, properties={"schema.auto-evolve": "false"}
    )
    t.set_properties({"schema.auto-evolve": None})  # unset -> default
    t.merge(
        _batch(
            spark, "k long, v int, extra string, op string, seq long",
            [(3, 30, "now legal", "U", 2)],
        ),
        op_col="op", order_cols=("seq",), drop_cols=("seq",),
    )
    assert "extra" in t.schema.names
