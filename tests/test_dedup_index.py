"""Persisted dedup index (pipelines/dedup_index.py).

Invariants: (1) the indexed query returns EXACTLY what the one-shot
cross_corpus_near_dups returns on the same split; (2) the index
follows the documents table incrementally — after a merge + sync,
querying reflects adds/updates/deletes without a rebuild; (3) the
signature projection matches the aggregation-based signatures
bit-for-bit (same bucket scheme).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.types as T
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.lake.table import LakeTable
from haskell_dbfunctor_spark.pipelines.dedup_index import (
    create_dedup_index, cross_corpus_near_dups_indexed, sync_dedup_index,
    with_signatures,
)
from haskell_dbfunctor_spark.pipelines.dedup_text import cross_corpus_near_dups

DOC_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])


def _docs_lake(spark, tmp_path, docs_df):
    t = LakeTable.create(
        spark, str(tmp_path / "docs"), DOC_SCHEMA, key_cols=["doc_id"],
        num_buckets=4,
    )
    t.merge(docs_df.select("doc_id", "text"), op_col=None, order_cols=())
    return t


def _result_set(df):
    return sorted(
        (r.in_doc_id, r.match_doc_id, r.jaccard) for r in df.collect()
    )


def test_indexed_equals_one_shot(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    inc = docs.where(F.col("doc_id") % 7 == 0)
    corp = docs.where(F.col("doc_id") % 7 != 0)

    dl = _docs_lake(spark, tmp_path, corp)
    ix = create_dedup_index(spark, str(tmp_path / "ix"), num_buckets=4)
    st = sync_dedup_index(dl, ix)
    assert not st["skipped"]

    got = _result_set(
        cross_corpus_near_dups_indexed(inc, ix, num_partitions=16)
    )
    want = _result_set(
        cross_corpus_near_dups(inc, corp, num_partitions=16)
    )
    assert got == want and len(want) > 0


def test_signature_projection_matches_aggregation(spark, sf_dir):
    """Row-wise signatures == groupBy signatures (bucket scheme is
    shared with lsh_candidate_pairs / cross_corpus_near_dups)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    proj = {
        r.doc_id: (sorted(r.words), list(r.buckets))
        for r in with_signatures(docs.select("doc_id", "text")).collect()
    }
    k, bands, rpb = 16, 8, 2
    dw = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(F.split("text", " "), lambda w: w != "")
            )
        ).alias("word"),
    )
    sigs = dw.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat("word", F.lit(f"#{i}")))).alias(f"mh_{i}")
            for i in range(k)
        ],
        F.collect_set("word").alias("words"),
    )
    agg = {
        r.doc_id: (sorted(r.words), list(r.buckets))
        for r in sigs.select(
            "doc_id", "words",
            F.array(*[
                F.xxhash64(F.concat_ws(
                    "|", *[f"mh_{i}" for i in range(b * rpb, (b + 1) * rpb)]
                ))
                for b in range(bands)
            ]).alias("buckets"),
        ).collect()
    }
    assert proj == agg


def test_incremental_sync_tracks_adds_updates_deletes(spark, tmp_path):
    base = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "one two three four five six seven"),
            (3, "unrelated totally different words here"),
        ],
        DOC_SCHEMA,
    )
    dl = _docs_lake(spark, tmp_path, base)
    ix = create_dedup_index(spark, str(tmp_path / "ix"), num_buckets=2)
    sync_dedup_index(dl, ix)

    inc = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], DOC_SCHEMA
    )
    assert _result_set(
        cross_corpus_near_dups_indexed(inc, ix, num_partitions=8, salt=4)
    ) == [(100, 1, 1.0)]

    # delete doc 1, update doc 2 to match the incoming text, add doc 9
    ch = spark.createDataFrame(
        [
            (1, None, "D", 1),
            (2, "alpha beta gamma delta epsilon zeta", "U", 2),
            (9, "brand new corpus doc entirely", "U", 3),
        ],
        "doc_id long, text string, op string, seq long",
    )
    dl.merge(ch, op_col="op", order_cols=("seq",), drop_cols=("seq",))
    st = sync_dedup_index(dl, ix)
    assert not st["skipped"]
    # doc 1 gone -> best match is now doc 2
    assert _result_set(
        cross_corpus_near_dups_indexed(inc, ix, num_partitions=8, salt=4)
    ) == [(100, 2, 1.0)]
    # re-sync with no new commits is a cursor no-op
    assert sync_dedup_index(dl, ix)["skipped"]


def test_replay_maintains_transcript_index(spark, tmp_path):
    """CDC replay with --dedup-index-root semantics: the transcript
    signature index is refreshed from each epoch's CDF diff inside the
    same multi-table transaction. Final index == a from-scratch
    signature build over the final state; resume is a no-op for BOTH
    tables."""
    from haskell_dbfunctor_spark.cdc.apply import (
        open_or_create_dedup_index, open_or_create_transcripts, replay,
    )
    from haskell_dbfunctor_spark.cdc.generator import change_feed
    from haskell_dbfunctor_spark.lake.transaction import Catalog

    feed = change_feed(spark, 4000, seed=7, n_convs=40, n_epochs=4)
    table = open_or_create_transcripts(
        spark, str(tmp_path / "t"), num_buckets=4
    )
    ix = open_or_create_dedup_index(spark, str(tmp_path / "ix"), num_buckets=4)
    cat = Catalog(spark, str(tmp_path / "_catalog"))
    st = replay(table, feed, 4, catalog=cat, dedup_index=ix)
    assert st.epochs_applied == 4

    def key_sigs(df):
        return {
            (r.conv_id, r.turn_idx): (sorted(r.words), list(r.buckets))
            for r in df.collect()
        }

    hf = ix.properties["dedup.hash_family"]
    assert hf == "xxh"  # the ingest index defaults to the fast family
    got = key_sigs(ix.read())
    want = key_sigs(
        with_signatures(
            table.read().select("conv_id", "turn_idx", "text"),
            hash_family=hf,
        )
    )
    assert got == want and len(want) > 0

    # resume: every epoch skips, neither table advances
    v_t, v_ix = table.version, ix.version
    st2 = replay(table, feed, 4, catalog=cat, dedup_index=ix)
    assert st2.epochs_skipped == 4 and st2.epochs_applied == 0
    assert table.version == v_t and ix.version == v_ix


def test_stream_tail_maintains_index_with_cross_batch_lww(spark, tmp_path):
    """--stream + --dedup-index-root semantics: each micro-batch
    commits state + index atomically, and a LATE WAL file in a later
    micro-batch can overwrite NEITHER the state text NOR its index
    signature (the index merge applies the same ts matched-filter)."""
    import os
    import time as _time
    from datetime import datetime

    from haskell_dbfunctor_spark.cdc.apply import open_or_create_dedup_index
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
    ix = open_or_create_dedup_index(spark, str(tmp_path / "ix"), num_buckets=4)
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
            ("U", "c1", 0, "the new winning text", datetime(2025, 1, 2), 2),
            ("U", "c2", 5, "another turn entirely", datetime(2025, 1, 1), 1),
        ],
        "wal-000", t0,
    )
    # stale rewrite of c1/0 and a delete of c2/5, in a LATER batch
    seg(
        [
            ("U", "c1", 0, "stale loser text", datetime(2025, 1, 1), 1),
            ("D", "c2", 5, None, datetime(2025, 1, 3), 3),
        ],
        "wal-001", t0 + 1,
    )

    q = tail_feed_dir(
        spark, table, feed_dir, available_now=True, max_files_per_trigger=1,
        dedup_index=ix, catalog=cat,
    )
    await_or_raise(q, 300)

    assert [r.text for r in table.read().collect()] == [
        "the new winning text"
    ]
    got = {
        (r.conv_id, r.turn_idx): sorted(r.words) for r in ix.read().collect()
    }
    want = {
        (r.conv_id, r.turn_idx): sorted(r.words)
        for r in with_signatures(
            table.read().select("conv_id", "turn_idx", "text"),
            hash_family=ix.properties["dedup.hash_family"],
        ).collect()
    }
    assert got == want == {
        ("c1", 0): sorted("the new winning text".split())
    }


def test_index_refresh_paths_agree(spark, tmp_path):
    """The raw-batch leg (no expectations gate) and the post-gate CDF
    leg must converge to the same index. Same feed replayed through
    both (the gate path forced by an always-true expectation): final
    index states identical, including a key whose text degenerates
    (leaves the index) and in-epoch LWW collisions."""
    from pyspark.sql import functions as F

    from haskell_dbfunctor_spark.cdc.apply import (
        open_or_create_dedup_index, open_or_create_transcripts, replay,
    )
    from haskell_dbfunctor_spark.cdc.generator import change_feed
    from haskell_dbfunctor_spark.lake.transaction import Catalog

    feed = change_feed(spark, 3000, seed=11, n_convs=30, n_epochs=3)

    def run(sub, expectations):
        table = open_or_create_transcripts(
            spark, str(tmp_path / sub / "t"), num_buckets=4
        )
        ix = open_or_create_dedup_index(
            spark, str(tmp_path / sub / "ix"), num_buckets=4
        )
        cat = Catalog(spark, str(tmp_path / sub / "_catalog"))
        replay(
            table, feed, 3, catalog=cat, dedup_index=ix,
            expectations=expectations,
        )
        return {
            (r.conv_id, r.turn_idx): (sorted(r.words), list(r.buckets))
            for r in ix.read().collect()
        }

    raw = run("raw", None)
    gated = run("gated", {"always": F.lit(True)})
    assert raw == gated and len(raw) > 0


def test_signature_projection_property(spark):
    """Property: for ARBITRARY text (unicode, repeated/leading
    whitespace, empties, single words), the row-wise projection equals
    the aggregation-based signature build word-for-word and
    bucket-for-bucket, and empty-word docs are exactly the excluded
    set."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    word = st.text(
        alphabet=st.characters(blacklist_characters=" ", blacklist_categories=("Cs",)),
        min_size=0, max_size=8,
    )
    doc = st.lists(word, min_size=0, max_size=12).map(" ".join)

    @settings(
        max_examples=5, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(st.lists(doc, min_size=1, max_size=25))
    def run(texts):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], DOC_SCHEMA
        )
        proj = {
            r.doc_id: (sorted(r.words), list(r.buckets))
            for r in with_signatures(df).collect()
        }
        # oracle: python-side reference for words; Spark agg for hashes
        expect_ids = {
            i for i, t in enumerate(texts)
            if [w for w in t.split(" ") if w]
        }
        assert set(proj) == expect_ids
        for i, t in enumerate(texts):
            if i in proj:
                assert proj[i][0] == sorted(set(w for w in t.split(" ") if w))
        dw = df.select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.filter(F.split("text", " "), lambda w: w != "")
                )
            ).alias("word"),
        )
        k, bands, rpb = 16, 8, 2
        sigs = dw.groupBy("doc_id").agg(
            *[
                F.min(F.md5(F.concat("word", F.lit(f"#{i}")))).alias(f"mh_{i}")
                for i in range(k)
            ]
        )
        agg = {
            r.doc_id: list(r.buckets)
            for r in sigs.select(
                "doc_id",
                F.array(*[
                    F.xxhash64(F.concat_ws(
                        "|", *[f"mh_{i}" for i in range(b * rpb, (b + 1) * rpb)]
                    ))
                    for b in range(bands)
                ]).alias("buckets"),
            ).collect()
        }
        assert {i: proj[i][1] for i in proj} == agg

    run()


def test_empty_docs_excluded(spark):
    df = spark.createDataFrame([(1, ""), (2, "   "), (3, "a b")], DOC_SCHEMA)
    got = {r.doc_id for r in with_signatures(df).collect()}
    assert got == {3}
