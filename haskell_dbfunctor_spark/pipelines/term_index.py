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

from typing import Sequence

import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..lake.sync import SYNC_PREFIX, sync_cursor
from ..lake.table import LakeError, LakeTable


def doc_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    id_cols: Sequence[str] | None = None,
) -> DataFrame:
    """(term, *ids, tf): lowercased whitespace tokens per document.
    One explode + one hash aggregation — map-side combinable,
    scan-speed. ``id_cols`` supports composite document keys (e.g. a
    transcript turn keyed (conv_id, turn_idx)); the single-id form
    aliases its column to ``doc_id``."""
    ids = list(id_cols) if id_cols is not None else [id_col]
    sel = (
        [F.col(ids[0]).alias("doc_id")] if id_cols is None
        else [F.col(c) for c in ids]
    )
    out_ids = ["doc_id"] if id_cols is None else ids
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda w: w != ""
    )
    return (
        docs.select(*sel, F.explode(toks).alias("term"))
        .groupBy("term", *out_ids)
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def postings_refresh(
    feed: DataFrame,
    id_cols: Sequence[str],
    text_col: str = "text",
) -> DataFrame:
    """Turn a PREIMAGE change feed (``changes(...)``/``changes_since``
    with ``preimages=True``) into a postings merge batch: the NEW
    postings of each changed doc as upserts plus a delete for every
    (old term, doc) the new text dropped — computed entirely from the
    feed's pre-images, so the index is never read back.

    Catch-up semantics per doc: OLD = pre-image of the FIRST touching
    commit (exactly what the index reflects), NEW = post-image of the
    LAST (or nothing on a final delete). A missing
    ``_commit_version`` column (single-commit ``changes()`` diff) is
    treated as one commit."""
    ids = list(id_cols)
    if "_commit_version" not in feed.columns:
        feed = feed.withColumn("_commit_version", F.lit(0).cast("int"))
    feed = feed.select(
        *ids, F.col(text_col).alias("__text"),
        "_change_type", "_commit_version",
    )
    pre = F.col("_change_type").isin("U_pre", "D")
    post = F.col("_change_type").isin("U_post", "I")  # noqa: F841
    per_doc = feed.groupBy(*ids).agg(
        F.min_by(
            F.when(pre, F.struct("__text")),
            F.when(pre, F.col("_commit_version")),
        ).alias("old"),
        F.max_by(
            F.struct("_change_type", "__text"), F.col("_commit_version")
        ).alias("last"),
    )
    imgs = per_doc.select(
        *ids,
        F.col("old.__text").alias("old_text"),
        F.when(
            F.col("last._change_type") != "D", F.col("last.__text")
        ).alias("new_text"),
    ).localCheckpoint(eager=False)
    new_p = doc_postings(
        imgs.where(F.col("new_text").isNotNull()),
        text_col="new_text", id_cols=ids,
    )
    old_p = doc_postings(
        imgs.where(F.col("old_text").isNotNull()),
        text_col="old_text", id_cols=ids,
    ).select("term", *ids)
    deletes = old_p.join(
        new_p.select("term", *ids), ["term", *ids], "left_anti"
    )
    return new_p.withColumn("op", F.lit("U")).unionByName(
        deletes.select(
            "term", *ids, F.lit(None).cast("long").alias("tf"),
            F.lit("D").alias("op"),
        )
    ).withColumn("seq", F.lit(0).cast("long"))


def create_term_index(
    spark: SparkSession,
    root: str,
    doc_id_type: T.DataType | str = "string",
    *,
    key_fields: Sequence[T.StructField] | None = None,
    num_buckets: int = 32,
    overwrite: bool = False,
) -> LakeTable:
    """Create the (term, *doc keys, tf) index table. Single-id form:
    ``doc_id_type`` names the id column's type (column is ``doc_id``).
    Composite form: ``key_fields`` carries the source table's key
    StructFields verbatim (e.g. conv_id/turn_idx for transcripts) —
    types must match the source exactly (the sync casts nothing)."""
    if key_fields is None:
        if isinstance(doc_id_type, str):
            named = {
                "string": T.StringType(), "long": T.LongType(),
                "bigint": T.LongType(), "int": T.IntegerType(),
            }
            if doc_id_type not in named:
                raise LakeError(
                    f"create_term_index: unknown doc_id_type "
                    f"{doc_id_type!r}"
                )
            doc_id_type = named[doc_id_type]
        key_fields = [T.StructField("doc_id", doc_id_type)]
    schema = T.StructType([
        T.StructField("term", T.StringType()),
        *key_fields,
        T.StructField("tf", T.LongType()),
    ])
    return LakeTable.create(
        spark, root, schema,
        key_cols=["term", *[f.name for f in key_fields]],
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

    ids = [c for c in index.key_cols if c != "term"]
    feed = src.changes_since(cursor, preimages=True)
    if ids == ["doc_id"] and id_col != "doc_id":
        feed = feed.withColumnRenamed(id_col, "doc_id")
    batch = postings_refresh(feed, ids, text_col=text_col)
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
