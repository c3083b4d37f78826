"""Persisted inverted term index — Lucene-style lexical search over
the corpus, maintained INCREMENTALLY off the documents table's change
feed.

Storage is a :class:`~haskell_dbfunctor_spark.lake.table.LakeTable`
keyed ``(term, doc_id)`` with a ``tf`` payload (one posting per row).
The sync consumes ``changes_since(cursor, preimages=True)``: for each
changed document it emits the NEW postings as upserts and — using the
pre-image text, so no index read-back is needed — a delete for every
(old term, doc) pair the new text no longer contains. The work per
sync is O(changed docs × terms/doc), never O(corpus); the cursor rides
the index table's own applied-epoch set (``sync-v<N>``, same
exactly-once contract as lake/sync.py).

Lookups go through ``read_where_eq`` — after ``analyze_bloom(["term"])``
a term probe opens only the files whose bloom admits the term
(manifest-level skipping; string min/max stats are deliberately not
used for pruning — see lake/dml.py's UTF-16 note). At 100 TB the index
is the difference between "grep the corpus" (a full scan per query)
and O(matching postings files).

Tokenization matches pipelines/text.py's whitespace discipline
(lowercased) so postings agree with the vocabulary/tf-idf queries.
The reference has no search surface (its tables are in-memory vectors,
/root/reference/src/RTable/Core.hs); this is a training-pipeline
extension (north rule: per-partition derived tables off the CDC loop).
"""

from __future__ import annotations

import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..lake.sync import SYNC_PREFIX, sync_cursor
from ..lake.table import LakeError, LakeTable


def doc_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term, doc_id, tf): lowercased whitespace tokens per document.
    One explode + one hash aggregation — map-side combinable,
    scan-speed."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda w: w != ""
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def create_term_index(
    spark: SparkSession,
    root: str,
    doc_id_type: T.DataType | str = "string",
    *,
    num_buckets: int = 32,
    overwrite: bool = False,
) -> LakeTable:
    """Create the (term, doc_id, tf) index table. ``doc_id_type``
    must match the source table's id column (the sync casts nothing)."""
    if isinstance(doc_id_type, str):
        named = {
            "string": T.StringType(), "long": T.LongType(),
            "bigint": T.LongType(), "int": T.IntegerType(),
        }
        if doc_id_type not in named:
            raise LakeError(
                f"create_term_index: unknown doc_id_type {doc_id_type!r}"
            )
        doc_id_type = named[doc_id_type]
    schema = T.StructType([
        T.StructField("term", T.StringType()),
        T.StructField("doc_id", doc_id_type),
        T.StructField("tf", T.LongType()),
    ])
    return LakeTable.create(
        spark, root, schema, key_cols=["term", "doc_id"],
        num_buckets=num_buckets, overwrite=overwrite,
    )


def sync_term_index(
    src: LakeTable,
    index: LakeTable,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "cow",
) -> dict:
    """Advance the index to ``src``'s current snapshot.

    Change semantics per document over the catch-up window
    [cursor, target]:

    - OLD terms = postings of the doc's text AS OF the cursor — the
      pre-image of the FIRST commit touching the doc (that is exactly
      the state the index currently reflects; intermediate images
      need no work, they were never indexed).
    - NEW terms = postings of the post-image of the LAST touching
      commit, or nothing if that commit deleted the doc.
    - Emit NEW as upserts, OLD ∖ NEW (by term) as deletes.

    One bucket-pruned CDF read + small per-doc aggregations + one
    idempotent MERGE under epoch ``sync-v<target>`` — re-running a
    crashed sync is a no-op.
    """
    cursor = sync_cursor(index)
    target = src.version
    if cursor > target:
        raise LakeError(
            f"sync_term_index: cursor {cursor} ahead of source "
            f"version {target} (source rolled back or wrong table?)"
        )
    if cursor == target:
        return {"synced_from": cursor, "synced_to": target, "skipped": True}

    feed = src.changes_since(cursor, preimages=True).select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        "_change_type", "_commit_version",
    )
    pre = F.col("_change_type").isin("U_pre", "D")
    post = F.col("_change_type").isin("U_post", "I")
    per_doc = feed.groupBy("doc_id").agg(
        # doc existed at cursor  <=>  some commit saw a pre-image
        F.min_by(
            F.when(pre, F.struct("text")), F.when(pre, F.col("_commit_version"))
        ).alias("old"),
        F.max_by(
            F.struct("_change_type", "text"), F.col("_commit_version")
        ).alias("last"),
    )
    imgs = per_doc.select(
        "doc_id",
        F.col("old.text").alias("old_text"),
        F.when(
            F.col("last._change_type") != "D", F.col("last.text")
        ).alias("new_text"),
    ).localCheckpoint(eager=False)

    new_p = doc_postings(
        imgs.where(F.col("new_text").isNotNull()),
        id_col="doc_id", text_col="new_text",
    )
    old_p = doc_postings(
        imgs.where(F.col("old_text").isNotNull()),
        id_col="doc_id", text_col="old_text",
    ).select("term", "doc_id")
    deletes = old_p.join(new_p.select("term", "doc_id"), ["term", "doc_id"], "left_anti")

    batch = new_p.withColumn("op", F.lit("U")).unionByName(
        deletes.select(
            "term", "doc_id", F.lit(None).cast("long").alias("tf"),
            F.lit("D").alias("op"),
        )
    ).withColumn("seq", F.lit(0).cast("long"))
    stats = index.merge(
        batch,
        epoch_id=f"{SYNC_PREFIX}{target}",
        op_col="op",
        order_cols=("seq",),
        drop_cols=("seq",),
        mode=mode,
    )
    return {
        "synced_from": cursor,
        "synced_to": target,
        "skipped": stats.skipped,
        "stats": stats,
    }


def lookup_term(index: LakeTable, term: str) -> DataFrame:
    """Postings for one term: (doc_id, tf). Run
    ``index.analyze_bloom(["term"])`` after syncs so the probe opens
    only bloom-admitted files instead of scanning the index."""
    return index.read_where_eq("term", term).select("doc_id", "tf")


def lookup_terms_ranked(index: LakeTable, terms: list[str]) -> DataFrame:
    """OR-query over several terms ranked by summed tf and number of
    matched terms: (doc_id, n_terms, total_tf). Point-probes each
    term (bloom-skipped) and aggregates the union — cost is
    O(matching postings), never the corpus."""
    if not terms:
        raise LakeError("lookup_terms_ranked: empty term list")
    parts = [
        index.read_where_eq("term", t).select("term", "doc_id", "tf")
        for t in terms
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (
        u.groupBy("doc_id")
        .agg(
            F.count_distinct("term").cast("long").alias("n_terms"),
            F.sum("tf").cast("long").alias("total_tf"),
        )
        .orderBy(F.desc("n_terms"), F.desc("total_tf"), "doc_id")
    )
