"""GENERATED ALWAYS AS columns (Delta generated-columns analog):
declared at create() only ({name: SQL expr}), recomputed from the
row's other columns on EVERY write path that produces new row images
(merge in all modes, update_where cow/mor/dv) — batches may omit them,
values they carry are overridden, so `g == expr(row)` holds for every
stored row with zero read-side cost. Guard rails: no generated keys,
exprs resolve against non-generated columns only, update_cols /
MoR partial patches / direct assignment are refused, drop/rename of a
referenced source column is refused while the generated column lives.
"""

import os
import shutil
import sys
import uuid

import pytest
from pyspark.sql import functions as F, types as T

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from haskell_dbfunctor_spark.lake.table import (  # noqa: E402
    LakeError,
    LakeTable,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("name", T.StringType()),
        T.StructField("band", T.StringType()),
        T.StructField("ts", T.LongType()),
    ]
)

GEN = {"band": "CASE WHEN v >= 100 THEN 'high' ELSE 'low' END"}


@pytest.fixture()
def root(tmp_path):
    d = str(tmp_path / f"gc_{uuid.uuid4().hex[:6]}")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _batch(spark, rows, cols="k long, v double, name string, ts long"):
    return spark.createDataFrame(rows, cols).withColumn("op", F.lit("U"))


def _make(spark, root, **kw):
    t = LakeTable.create(
        spark, root, SCHEMA, ["k"], num_buckets=4,
        generated_columns=GEN, **kw,
    )
    t.merge(
        _batch(spark, [(1, 50.0, "a", 1), (2, 150.0, "b", 1)]),
        epoch_id="e1", order_cols=("ts",), drop_cols=(),
    )
    return t


def _state(t):
    return {
        r["k"]: (r["v"], r["band"]) for r in t.read().collect()
    }


def test_create_validation(spark, root):
    with pytest.raises(LakeError, match="not in schema"):
        LakeTable.create(
            spark, root + "x", SCHEMA, ["k"],
            generated_columns={"nope": "v + 1"},
        )
    with pytest.raises(LakeError, match="key column"):
        LakeTable.create(
            spark, root + "y", SCHEMA, ["k"],
            generated_columns={"k": "v + 1"},
        )
    with pytest.raises(LakeError, match="does not resolve"):
        LakeTable.create(
            spark, root + "z", SCHEMA, ["k"],
            generated_columns={"band": "missing_col + 1"},
        )
    # exprs cannot read OTHER generated columns (no eval order)
    with pytest.raises(LakeError, match="does not resolve"):
        LakeTable.create(
            spark, root + "w", SCHEMA, ["k"],
            generated_columns={"band": "name", "name": "band"},
        )


def test_merge_computes_and_overrides(spark, root):
    t = _make(spark, root)
    assert _state(t) == {1: (50.0, "low"), 2: (150.0, "high")}
    # a batch CARRYING the generated column is overridden
    b = spark.createDataFrame(
        [(3, 500.0, "c", 2, "bogus")],
        "k long, v double, name string, ts long, band string",
    ).withColumn("op", F.lit("U"))
    t.merge(b, epoch_id="e2", order_cols=("ts",), drop_cols=())
    assert _state(t)[3] == (500.0, "high")
    # an update that moves v across the boundary recomputes band
    t.merge(
        _batch(spark, [(1, 120.0, "a", 3)]),
        epoch_id="e3", order_cols=("ts",), drop_cols=(),
    )
    assert _state(t)[1] == (120.0, "high")
    assert t.describe()["generated_columns"] == GEN


def test_mor_full_row_merge_may_omit_generated(spark, root):
    t = _make(spark, root)
    # MoR "full row" = every column the WRITER must supply; generated
    # ones are computed before the completeness check
    t.merge(
        _batch(spark, [(4, 10.0, "d", 2), (2, 20.0, "b", 2)]),
        epoch_id="m1", order_cols=("ts",), drop_cols=(), mode="mor",
    )
    st = _state(t)
    assert st[4] == (10.0, "low") and st[2] == (20.0, "low")
    t.compact_deltas()
    assert _state(t)[2] == (20.0, "low")


def test_update_cols_and_partial_refused(spark, root):
    t = _make(spark, root)
    with pytest.raises(LakeError, match="update_cols"):
        t.merge(
            _batch(spark, [(1, 60.0, "a", 9)]),
            order_cols=("ts",), drop_cols=(), update_cols=["v"],
        )
    with pytest.raises(LakeError, match="partial"):
        t.merge(
            spark.createDataFrame([(1, 60.0)], "k long, v double")
            .withColumn("op", F.lit("U")),
            order_cols=(), drop_cols=(), mode="mor", partial=True,
        )


def test_update_where_recomputes_all_modes(spark, root):
    for mode in ("cow", "mor", "dv"):
        r = root + mode
        t = _make(spark, r)
        t.update_where(
            F.col("k") == 1, {"v": F.lit(300.0)}, mode=mode
        )
        assert _state(t)[1] == (300.0, "high"), mode
        shutil.rmtree(r, ignore_errors=True)


def test_update_where_cannot_assign_generated(spark, root):
    t = _make(spark, root)
    with pytest.raises(LakeError, match="GENERATED"):
        t.update_where(F.col("k") == 1, {"band": F.lit("x")})


def test_drop_and_rename_guards(spark, root):
    t = _make(spark, root)
    with pytest.raises(LakeError, match="generated"):
        t.drop_column("v")
    with pytest.raises(LakeError, match="generated"):
        t.rename_column("v", "v2")
    with pytest.raises(LakeError, match="generated"):
        t.rename_column("band", "band2")
    # an UNREFERENCED column drops/renames fine
    t.rename_column("name", "label")
    assert "label" in t.schema.names
    # dropping the generated column itself clears the declaration
    t.drop_column("band")
    assert t._generated_columns() == {}
    assert t.describe()["generated_columns"] == {}
    # and v is droppable afterwards
    t.drop_column("v")


def test_constraints_see_generated_values(spark, root):
    t = LakeTable.create(
        spark, root, SCHEMA, ["k"], num_buckets=4,
        generated_columns=GEN,
        constraints={"band_known": "band IN ('low','high')"},
    )
    st = t.merge(
        _batch(spark, [(1, 50.0, "a", 1)]),
        epoch_id="e1", order_cols=("ts",), drop_cols=(),
        expectations={"v_pos": F.col("v") > 0},
    )
    assert st.extra.get("quarantined", 0) == 0
    assert _state(t) == {1: (50.0, "low")}


def test_cdf_carries_generated_column(spark, root):
    t = _make(spark, root)
    t.merge(
        _batch(spark, [(1, 200.0, "a", 5)]),
        epoch_id="e9", order_cols=("ts",), drop_cols=(),
    )
    ch = {
        (r["k"], r["_change_type"]): r["band"]
        for r in t.changes(t.version - 1, t.version).collect()
    }
    assert ch[(1, "U")] == "high"


def test_open_or_create_transcripts_generated(spark, tmp_path):
    """The CDC production surface: open_or_create_transcripts with
    generated_columns infers each expr's type, creates the extended
    schema, and every replay epoch recomputes the values."""
    from haskell_dbfunctor_spark.cdc.apply import (
        open_or_create_transcripts, replay,
    )
    from haskell_dbfunctor_spark.cdc.generator import change_feed

    root = str(tmp_path / "gt")
    t = open_or_create_transcripts(
        spark, root, num_buckets=4,
        generated_columns={"text_len": "length(text)"},
    )
    assert ("text_len", "int") in [
        (f.name, f.dataType.simpleString()) for f in t.schema.fields
    ]
    feed = change_feed(spark, n_events=2000, n_epochs=2, seed=3)
    replay(t, feed, 2)
    bad = t.read().where(
        F.col("text_len") != F.length("text")
    ).count()
    assert bad == 0
    # re-open ignores the declaration (create-time only, no clash)
    t2 = open_or_create_transcripts(
        spark, root, generated_columns={"other": "length(text)"}
    )
    assert t2._generated_columns() == {"text_len": "length(text)"}
