"""Document deduplication for training-data pipelines.

Exact dedup is a hash group-by. Near-dup comes in two flavors:
- ``near_dup_counts`` — word-shingle Jaccard via a shingle self-join:
  exact but O(candidate pairs); right at small-to-medium corpora or
  after LSH candidate pruning.
- ``minhash_signatures`` + banding — the scale path: signature size k,
  band-bucket join; candidate volume is controlled by bands, never by
  corpus size. At 100 TB: shingle explode is map-side, signatures are a
  single hash aggregation per doc, and the band join shuffles only
  (band, bucket) keys.

Hashes are md5-derived so an external SQL engine (the DuckDB oracle)
reproduces values bit-for-bit. simhash uses the first 8 hex chars of
md5 as a 32-bit integer hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _words(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Distinct (doc, word) pairs — the shingle relation."""
    return (
        docs.select(
            id_col,
            F.explode(
                F.array_distinct(
                    F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
                )
            ).alias("word"),
        )
    )


def exact_dedup_key(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: group by content hash, keep the smallest doc_id.

    At scale this is one hash aggregation (partial+final); the keeper
    choice (min id) is deterministic.
    """
    return (
        docs.groupBy(F.md5(F.lower(F.trim(F.col(text_col)))).alias("content_key"))
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def near_dup_counts(
    docs: DataFrame, threshold: float = 0.8, *, salt: int = 64
) -> DataFrame:
    """Per-doc count of near-duplicates by word-set Jaccard >= threshold.

    Shingle self-join plan: explode → distinct → equi-join on word →
    pair-count aggregation. The word key is few-valued and heavy-tailed
    (a common shingle matches most of the corpus), which AQE cannot fix
    — it coalesces by *input* size and would run the exploding join in
    one task — so the join is explicitly salted and width-pinned
    (operators/skew.py). The MinHash/LSH variant below is the 100 TB
    path that avoids the quadratic candidate set altogether.
    """
    from ..operators.skew import salted_equi_join

    dw = _words(docs)
    sz = dw.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    # size prefilter (AllPairs-style): J >= t forces set sizes within a
    # factor t of each other (c <= min(n1,n2) and c >= t(n1+n2)/(1+t)),
    # so size-incompatible pairs are dropped INSIDE the join, before
    # the pair-count aggregation ever sees their rows
    dw_n = dw.join(F.broadcast(sz), "doc_id")
    joined = salted_equi_join(
        dw_n, dw_n, "word",
        salt=salt, salt_by=["doc_id"],
        extra_cond=(
            (F.col("l.doc_id") < F.col("r.doc_id"))
            & (F.col("l.n") >= threshold * F.col("r.n"))
            & (F.col("r.n") >= threshold * F.col("l.n"))
        ),
        # wider than `salt`: per-(word,salt) output volume is uneven
        # (df varies per word), extra width smooths the tail
        num_partitions=salt * 4,
    )
    pairs = (
        joined.groupBy(
            F.col("doc_id").alias("d1"), F.col("doc_id_r").alias("d2"),
            F.col("n").alias("n1"), F.col("n_r").alias("n2"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    nd = (
        pairs.where(
            F.col("c") * 1.0 / (F.col("n1") + F.col("n2") - F.col("c"))
            >= F.lit(threshold)
        )
        .select("d1", "d2")
    )
    # explode(array(d1,d2)) instead of a self-unionAll: a union would
    # duplicate the whole exploding-join subtree in the physical plan
    # (it computes twice); explode evaluates it once
    cnt = (
        nd.select(F.explode(F.array("d1", "d2")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_near_dups"))
    )
    return (
        docs.select("doc_id")
        .join(cnt, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("n_near_dups", F.lit(0)).alias("n_near_dups")
        )
    )


def minhash_signatures(docs: DataFrame, k: int = 4) -> DataFrame:
    """MinHash signature per doc: mh_i = min over words of md5(word#i).

    One aggregation over the shingle relation — linear, map-side
    combinable, no pairwise work. Equality of any signature component
    (or of a band of components) gives LSH candidate pairs.
    """
    dw = _words(docs)
    return dw.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.col("word"), F.lit(f"#{i}")))).alias(f"mh_{i}")
            for i in range(k)
        ]
    )


def lsh_candidate_pairs(docs: DataFrame, k: int = 4, bands: int = 2) -> DataFrame:
    """Band the minhash signature and bucket-join: docs sharing a band
    bucket are near-dup candidates (verify with exact Jaccard after).
    rows_per_band = k // bands; bucket key = md5(concat(band rows)).
    """
    sigs = minhash_signatures(docs, k=k)
    rows_per_band = max(k // bands, 1)
    pair_frames = []
    for b in range(bands):
        cols = [f"mh_{i}" for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        bucket = sigs.select(
            "doc_id", F.md5(F.concat_ws("|", *cols)).alias("bucket")
        )
        l, r = bucket.alias("l"), bucket.alias("r")
        pair_frames.append(
            l.join(
                r,
                (F.col("l.bucket") == F.col("r.bucket"))
                & (F.col("l.doc_id") < F.col("r.doc_id")),
            ).select(
                F.col("l.doc_id").alias("d1"), F.col("r.doc_id").alias("d2")
            )
        )
    out = pair_frames[0]
    for pf in pair_frames[1:]:
        out = out.unionAll(pf)
    return out.distinct()


def simhash16(docs: DataFrame) -> DataFrame:
    """16-bit SimHash per doc from 32-bit md5-prefix word hashes.

    Bits are scored with a (doc, bit) aggregation after a sequence
    explode — 16× the shingle relation, still linear and combinable.
    """
    dw = _words(docs).withColumn(
        "h", F.conv(F.substring(F.md5(F.col("word")), 1, 8), 16, 10).cast("long")
    )
    bits = dw.select(
        "doc_id", "h", F.explode(F.sequence(F.lit(0), F.lit(15))).alias("bit")
    )
    scored = bits.groupBy("doc_id", "bit").agg(
        F.sum(
            F.when(F.expr("(h >> bit) & 1") == 1, 1).otherwise(-1)
        ).alias("s")
    )
    return scored.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(1, bit)").cast("long"))
            .otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )
