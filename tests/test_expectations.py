"""Merge expectations: the data-quality gate + quarantine sidecar.

Contract: a row failing ANY expectation never reaches the table — not
even transiently as an LWW winner — and lands in quarantine() with the
names of the predicates it violated; clean batches leave no quarantine
residue; epoch replay stays idempotent for both the table and the
quarantine (overwrite-by-epoch).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.types as T
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.lake.table import LakeTable

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
    T.StructField("n", T.LongType()),
    T.StructField("ts", T.TimestampType()),
])

def _expect():
    return {
        "v_not_blank": F.col("v") != "",
        "n_in_range": (F.col("n") >= 0) & (F.col("n") < 100),
    }


def _batch(spark, rows):
    """rows: (k, v, n, seq)."""
    df = spark.createDataFrame(rows, "k long, v string, n long, seq long")
    return df.select(
        "k", "v", "n",
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("seq")).alias("ts"),
        F.lit("U").alias("op"), "seq",
    )


def _mk(spark, root):
    return LakeTable.create(spark, root, SCHEMA, key_cols=["k"], num_buckets=2)


def _state(t):
    return {r["k"]: (r["v"], r["n"]) for r in t.read().collect()}


def test_failing_rows_quarantined_with_violation_names(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    st = t.merge(
        _batch(spark, [(1, "ok", 5, 1), (2, "", 5, 1), (3, "ok", -1, 1),
                       (4, "", 200, 1), (5, None, 5, 1)]),
        epoch_id="e0", expectations=_expect(),
    )
    assert st.extra["quarantined"] == 4
    assert set(_state(t)) == {1}
    q = {r["k"]: sorted(r["__violations"]) for r in t.quarantine().collect()}
    assert q == {
        2: ["v_not_blank"],
        3: ["n_in_range"],
        4: ["n_in_range", "v_not_blank"],
        5: ["v_not_blank"],  # NULL predicate fails closed
    }
    assert all(
        r["__epoch_id"] == "e0" for r in t.quarantine().collect()
    )


def test_bad_row_never_beats_good_in_lww(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    # same key: the NEWER row is bad — the older good row must win,
    # because the gate runs BEFORE dedup
    t.merge(
        _batch(spark, [(1, "good", 5, 1), (1, "", 7, 2)]),
        epoch_id="e0", expectations=_expect(),
    )
    assert _state(t)[1] == ("good", 5)


def test_clean_batch_leaves_no_residue(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    st = t.merge(_batch(spark, [(1, "a", 1, 1)]), epoch_id="e0",
                 expectations=_expect())
    assert st.extra["quarantined"] == 0
    assert not os.path.isdir(os.path.join(t.root, "quarantine")) or not (
        os.listdir(os.path.join(t.root, "quarantine"))
    )
    assert t.quarantine().count() == 0


def test_epoch_replay_idempotent_including_quarantine(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    b = _batch(spark, [(1, "a", 1, 1), (2, "", 1, 1)])
    t.merge(b, epoch_id="e0", expectations=_expect())
    assert t.merge(b, epoch_id="e0", expectations=_expect()).skipped
    assert t.quarantine().count() == 1  # not duplicated
    assert set(_state(t)) == {1}


def test_expectations_under_mor(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    st = t.merge(
        _batch(spark, [(1, "a", 1, 1), (2, "", 1, 1)]),
        epoch_id="e0", mode="mor", expectations=_expect(),
    )
    assert st.extra["quarantined"] == 1
    assert set(_state(t)) == {1}
    assert t.quarantine().count() == 1


def test_ephemeral_quarantine_cleaned_on_conflict(spark, tmp_path):
    """A merge WITHOUT an epoch_id tags its quarantine dir with a fresh
    uuid per attempt; if the commit loses an OCC race on the same
    bucket (re-execution required), the losing attempt's dir must be
    removed — otherwise the re-executed merge writes a second dir and
    quarantine() double-reports the same violations."""
    from haskell_dbfunctor_spark.lake.table import CommitConflict

    t = _mk(spark, str(tmp_path / "t"))
    t.merge(_batch(spark, [(1, "seed", 1, 1)]), epoch_id="e0")

    real_commit = t._commit
    injected = {"done": False}

    def racing_commit(manifest):
        if not injected["done"]:
            injected["done"] = True
            t2 = LakeTable.load(spark, t.root)
            # same key -> same bucket -> true overlap -> re-execute
            t2.merge(_batch(spark, [(1, "race", 2, 2)]))
        return real_commit(manifest)

    bad_batch = _batch(spark, [(1, "", -5, 3), (2, "ok", 5, 3)])
    t._commit = racing_commit
    try:
        try:
            t.merge(bad_batch, expectations=_expect())
            conflicted = False
        except CommitConflict:
            conflicted = True
    finally:
        t._commit = real_commit

    if conflicted:  # losing attempt left NO quarantine residue
        fresh = LakeTable.load(spark, t.root)
        assert fresh.quarantine().count() == 0
        # caller re-executes: exactly one violation recorded
        fresh.merge(bad_batch, expectations=_expect())
        assert fresh.quarantine().count() == 1
    else:  # rebase succeeded (disjoint) — still exactly one record
        assert LakeTable.load(spark, t.root).quarantine().count() == 1
