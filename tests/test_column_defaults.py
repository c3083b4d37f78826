"""Column defaults (Iceberg v3 default-values analog):
add_column(name, type, default=v) is a METADATA-ONLY commit — files
written before the add read the default (initial-default: per-row
resolution keyed on the writing snapshot's version parsed from the
file path), later files read raw (explicit NULL stays NULL), and
inserts that don't carry the column write the default (write-default
in the merge). Rewrites (compact / CoW DML / merge-touched buckets)
materialize defaults into the new files. CDF emits NO rows for the
metadata-only add. Zero read overhead when a table has no defaults.
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
        T.StructField("v", T.StringType()),
        T.StructField("ts", T.LongType()),
    ]
)


@pytest.fixture()
def root(tmp_path):
    d = str(tmp_path / f"cd_{uuid.uuid4().hex[:6]}")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _make(spark, root, n=8, **kw):
    t = LakeTable.create(spark, root, SCHEMA, ["k"], num_buckets=4, **kw)
    t.merge(
        spark.createDataFrame(
            [(i, f"a{i}", 1) for i in range(n)], "k long, v string, ts long"
        ),
        epoch_id="e1",
        op_col=None,
        order_cols=("ts",),
        drop_cols=(),
    )
    return t


def _scores(t):
    return {r["k"]: r["score"] for r in t.read().collect()}


def test_initial_and_write_default(spark, root):
    t = _make(spark, root)
    t.add_column("score", "double", default=0.5)
    assert all(v == 0.5 for v in _scores(t).values())  # initial-default
    # insert WITHOUT the column -> write-default; WITH -> raw values
    t.merge(
        spark.createDataFrame([(100, "n", 2)], "k long, v string, ts long"),
        epoch_id="e2", op_col=None, order_cols=("ts",), drop_cols=(),
    )
    t.merge(
        spark.createDataFrame(
            [(101, "x", 3, 0.9), (102, "y", 3, None)],
            "k long, v string, ts long, score double",
        ),
        epoch_id="e3", op_col=None, order_cols=("ts",), drop_cols=(),
    )
    s = _scores(t)
    assert s[100] == 0.5 and s[101] == 0.9 and s[102] is None
    assert s[1] == 0.5  # untouched pre-add rows still default


def test_version_shaped_root_resolves_per_file(spark, tmp_path):
    """ADVICE r04: a lake ROOTED under a directory that itself matches
    the snapshot-dir pattern s{N}-{8hex} (e.g. .../s99-deadbeef/lake)
    must still resolve defaults from each FILE's own snapshot segment,
    not the root's. Extraction takes the LAST version-shaped path
    segment (greedy-prefix regex, engine + streaming worker lockstep).
    With the old first-match rule every file here would parse version
    99 (>= the add version), so pre-add rows would wrongly read NULL."""
    root = str(tmp_path / "s99-deadbeef" / "lake")
    t = _make(spark, root)  # version 1 files predate the add
    t.add_column("score", "double", default=0.5)
    assert all(v == 0.5 for v in _scores(t).values())
    # post-add files read raw (explicit value and explicit NULL)
    t.merge(
        spark.createDataFrame(
            [(101, "x", 3, 0.9), (102, "y", 3, None)],
            "k long, v string, ts long, score double",
        ),
        epoch_id="e2", op_col=None, order_cols=("ts",), drop_cols=(),
    )
    s = _scores(t)
    assert s[101] == 0.9 and s[102] is None and s[1] == 0.5


def test_add_without_default_reads_null(spark, root):
    t = _make(spark, root, n=3)
    t.add_column("extra", "string")
    assert all(r["extra"] is None for r in t.read().collect())


def test_predicates_and_dml_see_defaults(spark, root):
    t = _make(spark, root)
    t.add_column("score", "double", default=0.5)
    t.analyze(["score"])
    assert t.read_where("score", 0.5, 0.5).count() == 8
    t.update_where("score = 0.5 AND k = 2", {"score": F.lit(0.7)})
    s = _scores(t)
    assert s[2] == 0.7 and s[3] == 0.5
    t.delete_where("score = 0.5 AND k = 3")
    assert 3 not in _scores(t)
    t.delete_where("score = 0.5 AND k = 4", mode="dv")
    assert 4 not in _scores(t)


def test_rewrites_materialize(spark, root):
    t = _make(spark, root)
    t.add_column("score", "double", default=0.5)
    before = _scores(t)
    t.compact(min_files=1)
    assert _scores(t) == before
    t.rebucket(8)
    assert _scores(t) == before
    # merge-update of one key: its bucket rewrites with defaults intact
    t.merge(
        spark.createDataFrame([(1, "u", 9)], "k long, v string, ts long"),
        epoch_id="e4", op_col=None, order_cols=("ts",), drop_cols=(),
    )
    s = _scores(t)
    assert s[1] == 0.5 and s[0] == 0.5


def test_cdf_silent_across_add(spark, root):
    t = _make(spark, root, n=4)  # v1
    t.add_column("score", "double", default=0.5)  # v2, metadata-only
    assert t.changes(1, 2).count() == 0
    # a later real change reports only ITS keys, with defaults filled
    t.merge(
        spark.createDataFrame([(0, "u", 9)], "k long, v string, ts long"),
        epoch_id="e2", op_col=None, order_cols=("ts",), drop_cols=(),
    )
    ch = {r["k"]: r for r in t.changes(2).collect()}
    assert set(ch) == {0} and ch[0]["_change_type"] == "U"
    assert ch[0]["score"] == 0.5


def test_mor_collapse_fills_base_rows(spark, root):
    t = _make(spark, root, n=4)
    t.add_column("score", "double", default=0.5)
    # full-row MoR delta must carry every column (contract) — the
    # pre-add BASE rows of untouched keys still read the default
    # through the collapsing read
    t.merge(
        spark.createDataFrame(
            [(0, "m", 2, 0.9)], "k long, v string, ts long, score double"
        ),
        epoch_id="m1", op_col=None, order_cols=("ts",), drop_cols=(),
        mode="mor",
    )
    s = _scores(t)
    assert s[0] == 0.9 and s[1] == 0.5 and s[3] == 0.5
    t.compact_deltas()
    assert _scores(t) == s


def test_defaults_with_row_lineage(spark, root):
    t = LakeTable.create(
        spark, root, SCHEMA, ["k"], num_buckets=4, row_lineage=True
    )
    t.merge(
        spark.createDataFrame(
            [(i, f"a{i}", 1) for i in range(4)], "k long, v string, ts long"
        ),
        epoch_id="e1", op_col=None, order_cols=("ts",), drop_cols=(),
    )
    ids = {
        r["k"]: r["__row_id"]
        for r in t.read(with_lineage=True).collect()
    }
    t.add_column("score", "double", default=0.5)
    out = {
        r["k"]: (r["score"], r["__row_id"])
        for r in t.read(with_lineage=True).collect()
    }
    assert all(v[0] == 0.5 and v[1] == ids[k] for k, v in out.items())


def test_validation_and_bookkeeping(spark, root):
    t = _make(spark, root, n=3)
    with pytest.raises(LakeError, match="does not cast"):
        t.add_column("bad", "double", default="not-a-number")
    with pytest.raises(LakeError, match="plain literal"):
        t.add_column("bad", "string", default=[1, 2])
    with pytest.raises(LakeError, match="already exists"):
        t.add_column("v", "string")
    with pytest.raises(LakeError, match="reserved"):
        t.add_column("__row_id", "long")
    t.add_column("score", "double", default=0.5)
    t.drop_column("score")
    assert "score" not in (t.manifest.get("column_defaults") or {})
    with pytest.raises(LakeError, match="dropped earlier"):
        t.add_column("score", "double", default=0.1)
    # rename carries the (inert, materialized) entry under the new name
    t.add_column("grade", "double", default=1.0)
    t.rename_column("grade", "grade2")
    assert "grade2" in t.manifest["column_defaults"]
    assert {r["grade2"] for r in t.read().collect()} == {1.0}


def test_clone_carries_defaults(spark, root):
    t = _make(spark, root, n=3)
    t.add_column("score", "double", default=0.5)
    c = t.shallow_clone(root + "_clone")
    assert {r["score"] for r in c.read().collect()} == {0.5}
    deep = t.shallow_clone(root + "_deep", deep=True)
    # deep-cloned files lose the snapshot version in their path —
    # resolution falls back to the footer probe
    assert {r["score"] for r in deep.read().collect()} == {0.5}


def test_add_column_races_merge(spark, root):
    """A merge holding a STALE snapshot races a concurrent
    add_column-with-default: the merge's commit must detect the schema
    change (never rebase over it) and re-execute, landing both the new
    column (with defaults visible on every pre-existing row) and the
    merged rows."""
    t1 = _make(spark, root, n=4)
    t2 = LakeTable.load(spark, root)  # second handle, same snapshot
    t1.add_column("score", "double", default=0.5)
    # t2 still believes the old schema; its merge conflicts + re-executes
    t2.merge(
        spark.createDataFrame([(100, "n", 2)], "k long, v string, ts long"),
        epoch_id="e2", op_col=None, order_cols=("ts",), drop_cols=(),
    )
    final = LakeTable.load(spark, root)
    assert "score" in final.schema.names
    s = {r["k"]: r["score"] for r in final.read().collect()}
    assert s[100] == 0.5  # write-default applied by the re-executed merge
    assert s[1] == 0.5    # initial-default intact
    assert len(s) == 5
