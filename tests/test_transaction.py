"""Multi-table atomic transactions (lake/transaction.py).

The catalog-serialized two-phase protocol: stage (WAP merges) →
CAS intent slot → validate vs published heads → CAS commit/abort
decision → idempotent roll-forward publish. Readers never observe a
partial transaction as steady state: nothing publishes before the
decision exists, and read-time repair (Catalog.read → recover)
completes crashed-but-committed transactions.

The reference gets cross-output atomicity for free by evaluating a
whole Julius chain in one process and materializing at the end
(/root/reference/src/Etl/Julius.hs); these tests pin the distributed
equivalent: all-or-nothing visibility across tables, crash recovery
in both directions (abort before decision, roll forward after), and
serialization with concurrent committers.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.lake.table import LakeError, LakeTable
from haskell_dbfunctor_spark.lake.transaction import (
    Catalog, TransactionAborted,
)

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])


def _batch(spark, ks, tag):
    rows = [(int(k), f"{tag}{k}") for k in ks]
    df = spark.createDataFrame(rows, "k long, v string")
    return df.select(
        "k", "v",
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("k")).alias("ts"),
        F.lit("U").alias("op"), F.col("k").alias("seq"),
    )


def _state(spark, root):
    t = LakeTable.load(spark, root)
    return sorted(tuple(r) for r in t.read().select("k", "v").collect())


def _mk(spark, root, num_buckets=2):
    t = LakeTable.create(
        spark, root, SCHEMA, key_cols=["k"], num_buckets=num_buckets
    )
    t.merge(_batch(spark, range(4), "pub"), epoch_id="e0")
    return t


@pytest.fixture
def two_tables(spark, tmp_path):
    a = _mk(spark, str(tmp_path / "a"))
    b = _mk(spark, str(tmp_path / "b"))
    cat = Catalog(spark, str(tmp_path / "cat"))
    return cat, a, b


def test_commit_publishes_all_tables(spark, two_tables):
    cat, a, b = two_tables
    base_a, base_b = _state(spark, a.root), _state(spark, b.root)
    txn = cat.begin()
    txn.merge(a, _batch(spark, [10], "txn"))
    txn.merge(b, _batch(spark, [20, 21], "txn"))
    # staged work is invisible before commit
    assert _state(spark, a.root) == base_a
    assert _state(spark, b.root) == base_b
    res = txn.commit()
    assert res["slot"] == 1 and len(res["tables"]) == 2
    assert (10, "txn10") in _state(spark, a.root)
    assert (20, "txn20") in _state(spark, b.root)
    h = cat.history()
    assert h[0]["decision"] == "commit" and h[0]["applied"]


def test_abort_publishes_nothing(spark, two_tables):
    cat, a, b = two_tables
    base_a, base_b = _state(spark, a.root), _state(spark, b.root)
    txn = cat.begin()
    txn.merge(a, _batch(spark, [10], "txn"))
    txn.merge(b, _batch(spark, [20], "txn"))
    txn.abort()
    assert _state(spark, a.root) == base_a
    assert _state(spark, b.root) == base_b
    with pytest.raises(LakeError):
        txn.merge(a, _batch(spark, [11], "late"))


def test_validation_conflict_aborts_atomically(spark, tmp_path):
    # overlap is guaranteed with one bucket: any out-of-band commit on
    # table A after the txn's fork point conflicts with its staged chain
    a = _mk(spark, str(tmp_path / "a"), num_buckets=1)
    b = _mk(spark, str(tmp_path / "b"), num_buckets=1)
    cat = Catalog(spark, str(tmp_path / "cat"))
    base_b = _state(spark, b.root)
    txn = cat.begin()
    txn.merge(a, _batch(spark, [10], "txn"))
    txn.merge(b, _batch(spark, [20], "txn"))
    # out-of-band overlapping publish to A between staging and commit
    LakeTable.load(spark, a.root).merge(
        _batch(spark, [99], "oob"), epoch_id="oob"
    )
    with pytest.raises(TransactionAborted):
        txn.commit()
    # ATOMIC abort: B untouched even though only A conflicted
    assert _state(spark, b.root) == base_b
    assert (10, "txn10") not in _state(spark, a.root)
    assert cat.history()[0]["decision"] == "abort"
    # the staged-but-aborted work re-runs cleanly from fresh handles
    txn2 = cat.begin()
    txn2.merge(LakeTable.load(spark, a.root), _batch(spark, [10], "txn"))
    txn2.merge(LakeTable.load(spark, b.root), _batch(spark, [20], "txn"))
    txn2.commit()
    assert (10, "txn10") in _state(spark, a.root)
    assert (20, "txn20") in _state(spark, b.root)


def test_crash_before_decision_recovers_to_abort(spark, two_tables):
    cat, a, b = two_tables
    base_a, base_b = _state(spark, a.root), _state(spark, b.root)
    txn = cat.begin()
    txn.merge(a, _batch(spark, [10], "txn"))
    txn.merge(b, _batch(spark, [20], "txn"))
    slot = txn._claim_slot()  # crash: intent durable, no decision
    stats = Catalog(spark, cat.root).recover()
    assert stats["aborted"] == 1
    assert _state(spark, a.root) == base_a
    assert _state(spark, b.root) == base_b
    # the revenant writer cannot resurrect the txn: decision is taken
    assert cat._decide(slot, "commit") == "abort"


def test_crash_after_decision_rolls_forward(spark, two_tables):
    cat, a, b = two_tables
    txn = cat.begin()
    txn.merge(a, _batch(spark, [10], "txn"))
    txn.merge(b, _batch(spark, [20], "txn"))
    slot = txn._claim_slot()
    assert cat._decide(slot, "commit") == "commit"
    # crash mid-roll-forward: only A published
    LakeTable.load(spark, a.root, version=txn._staged[a.root]).publish(
        txn._staged[a.root]
    )
    assert (20, "txn20") not in _state(spark, b.root)
    # read-time repair completes the txn (publish is epoch-idempotent,
    # so re-publishing A is a no-op)
    repaired = Catalog(spark, cat.root).read(b.root)
    assert (20, "txn20") in sorted(
        tuple(r) for r in repaired.read().select("k", "v").collect()
    )
    assert (10, "txn10") in _state(spark, a.root)
    # recovery is idempotent: a second pass skips the applied intent
    assert Catalog(spark, cat.root).recover()["skipped"] == 1


def test_serialized_commits_disjoint_fast_forward(spark, tmp_path):
    # two txns fork from the same published head of A but touch
    # DISJOINT buckets: the later one fast-forwards (no abort) — the
    # same OCC rebase rule as single-table commits
    a = _mk(spark, str(tmp_path / "a"), num_buckets=4)
    cat = Catalog(spark, str(tmp_path / "cat"))
    probe = spark.range(200).select(
        F.col("id").alias("k"), a.bucket_of(F.col("id")).alias("b")
    ).collect()
    by_bucket = {}
    for r in probe:
        by_bucket.setdefault(r.b, []).append(r.k)
    bks = sorted(by_bucket)
    assert len(bks) >= 2
    ks1, ks2 = by_bucket[bks[0]][:2], by_bucket[bks[1]][:2]
    t1, t2 = cat.begin(), cat.begin()
    t1.merge(LakeTable.load(spark, a.root), _batch(spark, ks1, "x"))
    t2.merge(LakeTable.load(spark, a.root), _batch(spark, ks2, "y"))
    t1.commit()
    t2.commit()  # disjoint buckets: validates clean, fast-forwards
    st = _state(spark, a.root)
    for k in ks1:
        assert (k, f"x{k}") in st
    for k in ks2:
        assert (k, f"y{k}") in st


def test_snapshot_is_consistent_and_pinned(spark, two_tables):
    cat, a, b = two_tables
    txn = cat.begin()
    txn.merge(a, _batch(spark, [10], "txn"))
    txn.merge(b, _batch(spark, [20], "txn"))
    txn.commit()
    snap = cat.snapshot([a.root, b.root])
    assert (10, "txn10") in sorted(
        tuple(r) for r in snap[a.root].read().select("k", "v").collect()
    )
    pinned_b = sorted(
        tuple(r) for r in snap[b.root].read().select("k", "v").collect()
    )
    # later commits do not leak into the pinned handles (immutable
    # copy-on-write data files; the handle stays on its version)
    txn2 = cat.begin()
    txn2.merge(
        LakeTable.load(spark, b.root), _batch(spark, [30], "late")
    )
    txn2.commit()
    assert sorted(
        tuple(r) for r in snap[b.root].read().select("k", "v").collect()
    ) == pinned_b
    assert (30, "late30") in _state(spark, b.root)


def test_snapshot_repairs_pending_txn_first(spark, two_tables):
    cat, a, b = two_tables
    txn = cat.begin()
    txn.merge(a, _batch(spark, [10], "txn"))
    txn.merge(b, _batch(spark, [20], "txn"))
    slot = txn._claim_slot()
    assert cat._decide(slot, "commit") == "commit"
    # crash before any publish: snapshot must roll the txn forward and
    # then pin BOTH tables' post-txn versions (never a torn pair)
    snap = Catalog(spark, cat.root).snapshot([a.root, b.root])
    assert (10, "txn10") in sorted(
        tuple(r) for r in snap[a.root].read().select("k", "v").collect()
    )
    assert (20, "txn20") in sorted(
        tuple(r) for r in snap[b.root].read().select("k", "v").collect()
    )


def test_empty_txn_commit_is_noop(spark, two_tables):
    cat, a, b = two_tables
    assert cat.begin().commit() == {"slot": None, "tables": {}}
    assert cat.history() == []


def test_expire_truncates_resolved_prefix_only(spark, two_tables):
    cat, a, b = two_tables
    for i in range(3):
        txn = cat.begin()
        txn.merge(LakeTable.load(spark, a.root), _batch(spark, [10 + i], "x"))
        txn.commit()
    # a pending (undecided) intent must fence the truncation
    t4 = cat.begin()
    t4.merge(LakeTable.load(spark, b.root), _batch(spark, [20], "p"))
    pending = t4._claim_slot()
    res = cat.expire(keep_last=0)
    assert res == {"removed": 3, "kept": 1}
    assert [h["slot"] for h in cat.history()] == [pending]
    # the pending intent still resolves normally
    assert Catalog(spark, cat.root).recover()["aborted"] == 1
    # slot numbers never reuse an expired slot (high-water mark)
    txn = cat.begin()
    txn.merge(LakeTable.load(spark, a.root), _batch(spark, [30], "y"))
    assert txn.commit()["slot"] == pending + 1
    # full truncation of an all-resolved log still advances slots
    cat.expire(keep_last=0)
    assert cat.history() == []
    txn = cat.begin()
    txn.merge(LakeTable.load(spark, a.root), _batch(spark, [31], "z"))
    assert txn.commit()["slot"] == pending + 2


def test_threaded_txns_serialize_and_lose_nothing(spark, tmp_path):
    """Concurrency soak of the whole protocol: two threads each drive
    three transactions over the SAME two tables, retrying on
    TransactionAborted (the OCC contract) with fresh handles. Both
    tables must converge to the union of every committed batch —
    nothing lost, nothing half-applied — and the catalog history must
    hold exactly the committed slots plus any aborted leftovers."""
    import threading

    a = _mk(spark, str(tmp_path / "a"), num_buckets=4)
    b = _mk(spark, str(tmp_path / "b"), num_buckets=4)
    cat = Catalog(spark, str(tmp_path / "cat"))
    errors = []

    def writer(w):
        try:
            for i in range(3):
                base = 100 + w * 10 + i
                for attempt in range(25):
                    txn = cat.begin()
                    try:
                        txn.merge(
                            LakeTable.load(spark, a.root),
                            _batch(spark, [base], f"w{w}-"),
                        )
                        txn.merge(
                            LakeTable.load(spark, b.root),
                            _batch(spark, [base], f"w{w}-"),
                        )
                        txn.commit()
                        break
                    except TransactionAborted:
                        continue
                else:
                    raise AssertionError(f"writer {w} gave up on {base}")
        except Exception as exc:  # surface across the thread boundary
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    expected = {100 + w * 10 + i for w in range(2) for i in range(3)}
    for root in (a.root, b.root):
        st = dict(_state(spark, root))
        for k in expected:
            assert st.get(k, "").startswith("w"), (root, k, st.get(k))
    h = cat.history()
    assert sum(1 for r in h if r["decision"] == "commit") == 6
    assert all(r["applied"] for r in h if r["decision"] == "commit")


def test_stream_tail_with_transactional_rollup(spark, tmp_path):
    """tail_feed_dir(rollup=..., catalog=...): every micro-batch
    commits the state merge and the CDF-incremental rollup refresh
    atomically; a re-tail from the same checkpoint (or a fresh drain
    over the same files) replays nothing — exactly-once extends
    across BOTH tables."""
    from haskell_dbfunctor_spark.cdc.apply import (
        open_or_create_rollup, open_or_create_transcripts,
    )
    from haskell_dbfunctor_spark.cdc.generator import change_feed
    from haskell_dbfunctor_spark.streaming.tailer import (
        await_or_raise, tail_feed_dir,
    )

    feed = change_feed(spark, 1200, n_convs=30, max_turns=20, n_epochs=3)
    feed_dir = str(tmp_path / "feed")
    feed.repartition(1, "epoch").write.partitionBy("epoch").parquet(feed_dir)
    table = open_or_create_transcripts(
        spark, str(tmp_path / "state"), num_buckets=4
    )
    rollup = open_or_create_rollup(spark, str(tmp_path / "rollup"), ["role"])
    cat = Catalog(spark, str(tmp_path / "cat"))
    q = tail_feed_dir(
        spark, table, feed_dir, available_now=True,
        max_files_per_trigger=2,
        rollup=rollup, catalog=cat, rollup_group_cols=("role",),
    )
    await_or_raise(q, 300)
    table = cat.read(table.root)
    rollup = cat.read(rollup.root)
    assert _rollup_state(rollup) == _recomputed(table)
    assert table.read().count() > 0
    # drain again over the same checkpoint: no batches replay, both
    # tables byte-stable (exactly-once across the pair)
    v_state, v_roll = table.version, rollup.version
    q2 = tail_feed_dir(
        spark, table, feed_dir, available_now=True,
        rollup=rollup, catalog=cat, rollup_group_cols=("role",),
    )
    await_or_raise(q2, 300)
    assert LakeTable.load(spark, table.root).version == v_state
    assert LakeTable.load(spark, rollup.root).version == v_roll


def test_nullable_keys_merge_upsert_delete(spark, tmp_path):
    """create(nullable_keys=True): NULL is a legal key VALUE — rows
    keyed (role, NULL) insert, update, and delete like any other key
    (default tables drop NULL-keyed batch rows; the silent loss this
    pins against surfaced as vanished rollup groups)."""
    schema = T.StructType([
        T.StructField("role", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("live_rows", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ])
    t = LakeTable.create(
        spark, str(tmp_path / "t"), schema, key_cols=["role", "tool"],
        num_buckets=4, nullable_keys=True,
    )

    def b(rows, ts, seq, op="U"):
        df = spark.createDataFrame(
            rows, "role string, tool string, live_rows long"
        )
        return df.select(
            "role", "tool", "live_rows",
            F.timestamp_seconds(F.lit(ts)).alias("ts"),
            F.lit(op).alias("op"), F.lit(seq).cast("long").alias("seq"),
        )

    def state():
        return sorted(
            (r.role, r.tool, r.live_rows) for r in t.read().collect()
        )

    t.merge(b([("assistant", None, 10), ("user", None, 20),
               ("tool", "bash", 5)], 1_700_000_000, 0), epoch_id="e0")
    assert state() == [("assistant", None, 10), ("tool", "bash", 5),
                       ("user", None, 20)]
    t.merge(b([("assistant", None, 11)], 1_700_000_001, 1), epoch_id="e1")
    assert state() == [("assistant", None, 11), ("tool", "bash", 5),
                       ("user", None, 20)]
    t.merge(b([("user", None, 0)], 1_700_000_002, 2, op="D"),
            epoch_id="e2")
    assert state() == [("assistant", None, 11), ("tool", "bash", 5)]


def _null_low(v):
    # NULL group keys sort below any string (both helpers apply the
    # same mapping, so the equality comparison is unaffected)
    return "" if v is None else f"v{v}"


def _rollup_state(rollup, cols=("role",)):
    return sorted(
        (tuple(_null_low(r[c]) for c in cols), r["live_rows"])
        for r in rollup.read().select(*cols, "live_rows").collect()
    )


def _recomputed(table, cols=("role",)):
    return sorted(
        (tuple(_null_low(r[c]) for c in cols), r["n"])
        for r in table.read().groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n")).collect()
    )


def test_replay_with_transactional_rollup(spark, tmp_path):
    """The production path: jobs/cdc_ingest.py --rollup-root. Every
    epoch commits state + derived rollup atomically; the rollup always
    equals a recompute over the state, including across schema
    evolution, idempotent re-apply, and mid-stream crash resume."""
    from haskell_dbfunctor_spark.cdc.apply import (
        open_or_create_rollup, open_or_create_transcripts, replay,
    )
    from haskell_dbfunctor_spark.cdc.generator import change_feed

    feed = change_feed(
        spark, 2000, n_convs=40, max_turns=20, n_epochs=4,
        evolution_epoch=2,
    ).persist()
    feed.count()
    table = open_or_create_transcripts(
        spark, str(tmp_path / "state"), num_buckets=4
    )
    # grouping on (role, tool) exercises the evolution path: `tool`
    # does not exist before epoch 2, so early refreshes must roll
    # those rows up under the NULL group like a recompute would
    cols = ("role", "tool")
    rollup = open_or_create_rollup(
        spark, str(tmp_path / "rollup"), list(cols)
    )
    cat = Catalog(spark, str(tmp_path / "cat"))
    st = replay(
        table, feed, 4, evolution_epoch=2,
        rollup=rollup, catalog=cat, rollup_group_cols=cols,
    )
    assert st.epochs_applied == 4
    assert _rollup_state(rollup, cols) == _recomputed(table, cols)
    # the state itself matches a plain (non-transactional) replay
    plain = open_or_create_transcripts(
        spark, str(tmp_path / "plain"), num_buckets=4
    )
    replay(plain, feed, 4, evolution_epoch=2)
    assert sorted(
        tuple(r) for r in table.read().select(
            "conv_id", "turn_idx", "role", "text"
        ).collect()
    ) == sorted(
        tuple(r) for r in plain.read().select(
            "conv_id", "turn_idx", "role", "text"
        ).collect()
    )
    # idempotent re-apply: every epoch skips, rollup untouched
    before = _rollup_state(rollup, cols)
    st2 = replay(
        table, feed, 4, evolution_epoch=2,
        rollup=rollup, catalog=cat, rollup_group_cols=cols,
    )
    assert st2.epochs_applied == 0 and st2.epochs_skipped == 4
    assert _rollup_state(rollup, cols) == before
    feed.unpersist()


def test_replay_rollup_resumes_from_crash(spark, tmp_path):
    from haskell_dbfunctor_spark.cdc.apply import (
        open_or_create_rollup, open_or_create_transcripts, replay,
    )
    from haskell_dbfunctor_spark.cdc.generator import change_feed

    feed = change_feed(
        spark, 1500, n_convs=30, max_turns=20, n_epochs=3,
    ).persist()
    feed.count()
    table = open_or_create_transcripts(
        spark, str(tmp_path / "state"), num_buckets=4
    )
    rollup = open_or_create_rollup(spark, str(tmp_path / "rollup"), ["role"])
    cat = Catalog(spark, str(tmp_path / "cat"))
    st = replay(
        table, feed, 3, stop_after=1,
        rollup=rollup, catalog=cat, rollup_group_cols=("role",),
    )
    assert st.epochs_applied == 1
    # even mid-stream the pair is consistent (that's the atomicity)
    assert _rollup_state(rollup) == _recomputed(table)
    st2 = replay(
        table, feed, 3,
        rollup=rollup, catalog=cat, rollup_group_cols=("role",),
    )
    assert st2.epochs_skipped == 1 and st2.epochs_applied == 2
    assert _rollup_state(rollup) == _recomputed(table)
    feed.unpersist()
