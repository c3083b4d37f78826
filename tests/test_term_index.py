"""Persisted inverted term index: incremental CDF sync correctness
(the index always equals postings-of-current-corpus), delete/update
propagation, exactly-once re-sync, and bloom-skipped lookups.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.types as T
import pytest
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.lake.table import LakeTable
from haskell_dbfunctor_spark.pipelines.term_index import (
    create_term_index, doc_postings, lookup_term, lookup_terms_ranked,
    sync_term_index,
)

DOCS = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("text", T.StringType()),
])


def _docs_table(spark, root):
    return LakeTable.create(
        spark, root, DOCS, key_cols=["doc_id"], num_buckets=4
    )


def _merge_docs(t, rows, epoch, spark):
    df = spark.createDataFrame(
        [(d, x, "U" if x is not None else "D", i) for i, (d, x) in enumerate(rows)],
        "doc_id string, text string, op string, seq long",
    )
    t.merge(df, epoch_id=epoch, order_cols=("seq",), drop_cols=("seq",))


def _index_equals_corpus(spark, docs, index):
    want = sorted(
        map(tuple, doc_postings(docs.read()).collect())
    )
    got = sorted(map(tuple, index.read().collect()))
    assert got == want


def test_initial_build_update_delete_sync(spark, tmp_path):
    docs = _docs_table(spark, str(tmp_path / "docs"))
    idx = create_term_index(spark, str(tmp_path / "idx"), "string")
    _merge_docs(docs, [
        ("a", "the cat sat"),
        ("b", "the dog ran fast"),
        ("c", "cat and dog"),
    ], "e0", spark)
    res = sync_term_index(docs, idx)
    assert not res.get("skipped")
    _index_equals_corpus(spark, docs, idx)
    # idempotent re-sync: cursor caught up, no-op
    assert sync_term_index(docs, idx)["skipped"]

    # update changes a doc's term set; delete removes one entirely
    _merge_docs(docs, [
        ("a", "the cat slept indoors"),   # sat -> slept indoors
        ("c", None),                      # delete
    ], "e1", spark)
    sync_term_index(docs, idx)
    _index_equals_corpus(spark, docs, idx)
    got = {r["doc_id"] for r in lookup_term(idx, "cat").collect()}
    assert got == {"a"}
    assert not lookup_term(idx, "sat").collect()
    assert not lookup_term(idx, "and").collect()


def test_multi_commit_catchup_uses_first_pre_last_post(spark, tmp_path):
    docs = _docs_table(spark, str(tmp_path / "docs"))
    idx = create_term_index(spark, str(tmp_path / "idx"), "string")
    _merge_docs(docs, [("a", "alpha beta")], "e0", spark)
    sync_term_index(docs, idx)
    # three commits land before the next sync; intermediate images
    # must not matter, and a doc born+killed inside the window is a
    # no-op
    _merge_docs(docs, [("a", "beta gamma"), ("z", "zeta")], "e1", spark)
    _merge_docs(docs, [("a", "gamma delta")], "e2", spark)
    _merge_docs(docs, [("z", None)], "e3", spark)
    sync_term_index(docs, idx)
    _index_equals_corpus(spark, docs, idx)
    assert not lookup_term(idx, "zeta").collect()
    assert not lookup_term(idx, "alpha").collect()
    assert {r["doc_id"] for r in lookup_term(idx, "gamma").collect()} == {"a"}


def test_tf_and_ranked_lookup(spark, tmp_path):
    docs = _docs_table(spark, str(tmp_path / "docs"))
    idx = create_term_index(spark, str(tmp_path / "idx"), "string")
    _merge_docs(docs, [
        ("a", "x x x y"),
        ("b", "x y y"),
        ("c", "y"),
    ], "e0", spark)
    sync_term_index(docs, idx)
    tf = {r["doc_id"]: r["tf"] for r in lookup_term(idx, "x").collect()}
    assert tf == {"a": 3, "b": 1}
    ranked = lookup_terms_ranked(idx, ["x", "y"]).collect()
    assert [r["doc_id"] for r in ranked] == ["a", "b", "c"]
    assert ranked[0]["n_terms"] == 2 and ranked[0]["total_tf"] == 4


def test_bloom_skipped_lookup(spark, tmp_path):
    docs = _docs_table(spark, str(tmp_path / "docs"))
    idx = create_term_index(
        spark, str(tmp_path / "idx"), "string", num_buckets=8
    )
    rows = [(f"d{i}", f"tok{i} common filler{i % 5}") for i in range(200)]
    _merge_docs(docs, rows, "e0", spark)
    sync_term_index(docs, idx)
    idx.analyze_bloom(["term"])
    got = lookup_term(idx, "tok7").collect()
    assert [(r["doc_id"], r["tf"]) for r in got] == [("d7", 1)]
    # the probe must have skipped most files
    assert idx.last_pruned_files > 0


def test_replay_maintains_transcript_term_index(spark, tmp_path):
    """CDC replay with --term-index-root semantics: postings are
    refreshed from each epoch's CDF diff (pre-images supply old-term
    deletes) inside the same multi-table transaction. Final index ==
    a from-scratch postings build over the final state; resume is a
    no-op for BOTH tables."""
    from haskell_dbfunctor_spark.cdc.apply import (
        open_or_create_term_index, open_or_create_transcripts, replay,
    )
    from haskell_dbfunctor_spark.cdc.generator import change_feed
    from haskell_dbfunctor_spark.lake.transaction import Catalog

    feed = change_feed(spark, 4000, seed=7, n_convs=40, n_epochs=4)
    table = open_or_create_transcripts(
        spark, str(tmp_path / "t"), num_buckets=4
    )
    ix = open_or_create_term_index(spark, str(tmp_path / "ix"), num_buckets=4)
    cat = Catalog(spark, str(tmp_path / "_catalog"))
    st = replay(table, feed, 4, catalog=cat, term_index=ix)
    assert st.epochs_applied == 4

    got = sorted(
        map(tuple, ix.read().select("term", "conv_id", "turn_idx", "tf")
            .collect())
    )
    want = sorted(
        map(tuple, doc_postings(
            table.read(), id_cols=["conv_id", "turn_idx"]
        ).select("term", "conv_id", "turn_idx", "tf").collect())
    )
    assert got == want and len(want) > 0

    v_t, v_ix = table.version, ix.version
    st2 = replay(table, feed, 4, catalog=cat, term_index=ix)
    assert st2.epochs_skipped == 4 and st2.epochs_applied == 0
    assert table.version == v_t and ix.version == v_ix


def test_stream_tail_term_index_cross_batch_lww(spark, tmp_path):
    """--stream + --term-index-root: each micro-batch commits state +
    postings atomically; a LATE stale WAL file can neither overwrite
    the state text nor inject its postings (the refresh derives from
    the committed diff, which the LWW filter already excluded the
    stale row from), and a delete drops the turn's postings."""
    import time as _time
    from datetime import datetime

    from haskell_dbfunctor_spark.cdc.apply import open_or_create_term_index
    from haskell_dbfunctor_spark.lake.transaction import Catalog
    from haskell_dbfunctor_spark.streaming.tailer import (
        await_or_raise, tail_feed_dir,
    )

    schema = T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ])
    table = LakeTable.create(
        spark, str(tmp_path / "lake"), schema,
        key_cols=["conv_id", "turn_idx"], num_buckets=4,
    )
    ix = open_or_create_term_index(spark, str(tmp_path / "ix"), num_buckets=4)
    cat = Catalog(spark, str(tmp_path / "_catalog"))
    feed_dir = str(tmp_path / "feed")
    os.makedirs(feed_dir)

    def seg(rows, name, mtime):
        df = spark.createDataFrame(
            rows, "op string, conv_id string, turn_idx int, text string, "
            "ts timestamp, seq long"
        )
        staging = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.parquet(staging)
        src = next(f for f in os.listdir(staging) if f.endswith(".parquet"))
        dst = f"{feed_dir}/{name}.parquet"
        os.rename(f"{staging}/{src}", dst)
        os.utime(dst, (mtime, mtime))

    t0 = _time.time()
    seg(
        [
            ("U", "c1", 0, "winner text here", datetime(2025, 1, 2), 2),
            ("U", "c2", 5, "doomed turn", datetime(2025, 1, 1), 1),
        ],
        "wal-000", t0,
    )
    seg(
        [
            ("U", "c1", 0, "stale loser junk", datetime(2025, 1, 1), 1),
            ("D", "c2", 5, None, datetime(2025, 1, 3), 3),
        ],
        "wal-001", t0 + 1,
    )
    q = tail_feed_dir(
        spark, table, feed_dir, cross_batch_lww=True,
        catalog=cat, term_index=ix,
    )
    await_or_raise(q, timeout_s=240)

    got = sorted(
        map(tuple, ix.read().select("term", "conv_id", "turn_idx", "tf")
            .collect())
    )
    want = sorted(
        map(tuple, doc_postings(
            table.read(), id_cols=["conv_id", "turn_idx"]
        ).select("term", "conv_id", "turn_idx", "tf").collect())
    )
    assert got == want
    terms = {r[0] for r in got}
    assert "winner" in terms and "stale" not in terms
    assert "doomed" not in terms
