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
