"""Deterministic hash-based sampling for training-data pipelines.

Random sampling (``df.sample``) is seed- and partitioning-dependent:
re-running the pipeline, repartitioning the input, or moving to a
different cluster changes which rows are picked. Training-data curation
needs the opposite — a row's fate must be a pure function of its key,
so samples are reproducible across runs/engines, stable under data
layout, and consistent between train/test splits (a key assigned to
"test" can never leak into "train" on a later run).

The selector is a lexicographic comparison of ``md5(key)`` against a
hex threshold string: md5 is uniform over hex strings, available
bit-for-bit in both Spark and any SQL oracle, and the comparison is
pure per-row compute — the sample plan is a pushed-filter scan with NO
shuffle, which is exactly what you want in front of a 100 TB read
(filter prunes before any downstream exchange).

Threshold precision: 8 hex digits = 2^-32 granularity, plenty for any
practical fraction. Fractions map to thresholds identically in every
engine via the integer scale: ``frac -> hex(round(frac * 16^8))``.

The reference has no sampling surface (its tables are in-memory
vectors; `selectNrows` is a prefix take, /root/reference/src/RTable/
Core.hs); this is a training-pipeline extension (north rule).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

_SCALE = 16 ** 8  # 8 hex digits of md5


def hash_bucket_hex(key: Column, digits: int = 8) -> Column:
    """First ``digits`` hex chars of md5(key-as-string) — the uniform
    per-key draw both Spark and the SQL oracle can reproduce."""
    return F.substring(F.md5(key.cast("string")), 1, digits)


def threshold_hex(fraction: float, digits: int = 8) -> str:
    """The hex string h such that P(md5-prefix < h) == fraction (up to
    16^-digits). Shared by Spark and oracle so they can never drift."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    scale = 16 ** digits
    n = int(round(fraction * scale))
    if n >= scale:
        # the comparison is LEXICOGRAPHIC on hex strings: a 9-char
        # "100000000" would sort BELOW draws starting with 2-f. 'g'
        # sorts after every hex character, so every draw passes.
        return "g"
    return format(n, f"0{digits}x")

def hash_sample(
    df: DataFrame, key_col: str, fraction: float, *, seed: str = ""
) -> DataFrame:
    """Keep rows whose md5(seed || key) prefix falls below the fraction
    threshold. Deterministic per key; different ``seed`` strings give
    independent samples of the same table."""
    draw = hash_bucket_hex(F.concat(F.lit(seed), F.col(key_col).cast("string")))
    return df.where(draw < F.lit(threshold_hex(fraction)))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    *,
    default_fraction: float = 0.0,
    seed: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: each value of ``strata_col``
    keeps its own fraction of keys (e.g. downsample boilerplate-heavy
    sources harder than rare high-quality ones). Strata absent from
    ``fractions`` fall back to ``default_fraction``.

    Plan shape: ONE case-when threshold expression — still a pure
    pushed-filter scan, no join against a fractions table.
    """
    draw = hash_bucket_hex(F.concat(F.lit(seed), F.col(key_col).cast("string")))
    thr: Column = F.lit(threshold_hex(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(strata_col) == F.lit(value), F.lit(threshold_hex(frac))
        ).otherwise(thr)
    return df.where(draw < thr)


def train_test_split_col(
    key_col: str, test_fraction: float, *, seed: str = "", out_col: str = "split"
) -> Column:
    """A 'train'/'test' label column, a pure function of the key: the
    same key lands on the same side on every run, every engine, every
    repartitioning — the leak-proof split a training pipeline needs."""
    draw = hash_bucket_hex(F.concat(F.lit(seed), F.col(key_col).cast("string")))
    return (
        F.when(draw < F.lit(threshold_hex(test_fraction)), F.lit("test"))
        .otherwise(F.lit("train"))
        .alias(out_col)
    )


def pack_shards(
    docs: DataFrame,
    tokens_per_shard: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-balanced shard assignment — the write-side prep of a
    training pipeline: documents packed, in a deterministic global
    order, into shards of ~``tokens_per_shard`` tokens (greedy
    sequential packing: shard = floor(tokens_before / target)).

    Scale shape: the global running total is the distributed
    zipWithIndex pattern (same as operators/core.py:surrogate_key) —
    range-partition by id, per-partition window cumsum, O(partitions)
    driver pass for cumulative token offsets — NEVER a global
    single-task window. Deterministic in the id order, so re-runs
    shard identically (resumable output writes).
    """
    cum = _token_stream_offsets(docs, id_col, text_col)
    return cum.select(
        id_col,
        "n_tokens",
        F.floor(F.col("__before") / tokens_per_shard)
        .cast("long")
        .alias("shard_id"),
    )


def _token_stream_offsets(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, n_tokens, __before): each doc's whitespace token count and
    its exclusive cumulative offset in the deterministic id-ordered
    token stream — the distributed zipWithIndex shape (range-partition
    by id, per-partition window cumsum, O(partitions) driver pass for
    partition offsets; NEVER a global single-task window)."""
    from pyspark.sql import Window as W

    toks = docs.select(
        id_col,
        F.size(
            F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
        ).cast("long").alias("n_tokens"),
    )
    sdf = (
        toks.repartitionByRange(F.col(id_col))
        .sortWithinPartitions(id_col)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    totals = sorted(
        (r[0], r[1])
        for r in sdf.groupBy("__pid").agg(F.sum("n_tokens")).collect()
    )
    offsets, acc = [], 0
    for pid, tot in totals:
        offsets.append((pid, acc))
        acc += tot or 0
    off = F.broadcast(
        docs.sparkSession.createDataFrame(
            offsets or [(0, 0)], "__pid_o int, __off long"
        )
    )
    w = W.partitionBy("__pid").orderBy(id_col)
    return (
        sdf.join(off, sdf["__pid"] == off["__pid_o"], "left")
        .withColumn(
            "__before",
            F.sum("n_tokens").over(w) - F.col("n_tokens")
            + F.coalesce(F.col("__off"), F.lit(0)),
        )
        .drop("__pid", "__pid_o", "__off")
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk training-sequence packing: documents are laid
    end-to-end in deterministic id order and the token stream is cut
    into fixed ``seq_len`` sequences (the standard GPT-style pretrain
    packing — documents MAY straddle sequence boundaries; the model
    sees an EOD marker, not padding). Per document this emits where it
    lands:

      seq_id        sequence containing the doc's first token
      offset_in_seq position of that first token within the sequence
      n_seqs        how many sequences the doc straddles (>1 = split
                    across a boundary; the attention-masking /
                    boundary-loss bookkeeping a trainer needs)

    A zero-token document occupies no stream space and reports
    ``n_seqs=1`` at its boundary position. Built on the same
    distributed cumulative-offset pattern as :func:`pack_shards`
    (range-partition + per-partition window; no global window), so it
    scales to a 100 TB corpus: cost is one pass + an O(partitions)
    driver exchange. Deterministic in the id order — re-runs pack
    identically, which is what makes sharded training-data export
    resumable. Reference analog: none (training-export extension,
    north rule)."""
    cum = _token_stream_offsets(docs, id_col, text_col)
    seq_id = F.floor(F.col("__before") / seq_len).cast("long")
    last = F.col("__before") + F.greatest(
        F.col("n_tokens") - 1, F.lit(0)
    )
    return cum.select(
        id_col,
        "n_tokens",
        seq_id.alias("seq_id"),
        (F.col("__before") % seq_len).cast("long").alias("offset_in_seq"),
        (F.floor(last / seq_len).cast("long") - seq_id + 1).alias("n_seqs"),
    )


def cap_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    n: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-group cap — "at most N docs per source", the
    standard mix-balancing step before training: keeps each group's N
    rows with the smallest ``md5(id)`` (a seedless, reproducible,
    order-free subsample; ties broken by the id itself). The window
    partitions by the group columns — NEVER a global window — so at
    100 TB each group sorts independently inside its own partitions;
    md5 is used (not xxhash64) because the DuckDB oracle computes the
    identical hex ordering. Reference analog: runGroupBy + per-group
    limit (/root/reference/src/RTable/Core.hs:3429-3500 + limit).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def temperature_sample(
    df: DataFrame,
    key_col: str,
    group_col: str,
    *,
    tau: float = 0.5,
    base_rate: float = 1.0,
    seed: str = "",
) -> DataFrame:
    """Temperature-based source rebalancing (the T5/mT5 multilingual
    mixing rule) as a deterministic filter: group ``s`` keeps rate
    ``r_s = min(1, base_rate * (n_s / max_n)^(tau - 1))`` — ``tau=1``
    keeps every group at ``base_rate`` (proportional mix), ``tau=0``
    equalizes kept counts across groups (inverse-frequency), values
    between flatten the head without starving the tail. Keep decision:
    the md5 draw of ``seed || key`` (as a 32-bit integer) falls below
    ``round(r_s, 6) * 16^8`` — integer draw vs 6dp-rounded rate, so an
    external SQL engine lands on the same side of every boundary.

    Returns the kept rows plus the group's ``keep_rate`` column.

    Scale: one tiny hash agg for the group counts (O(groups) rows),
    broadcast back; the filter itself is a pure per-row expression on
    the scan — no shuffle of the data, no window. Rows whose group or
    key is NULL are dropped (no defined rate / no defined draw).
    """
    if not 0.0 <= tau <= 1.0:
        raise ValueError(f"tau must be in [0, 1], got {tau}")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    mx = counts.agg(F.max("__n").alias("__mx"))
    rates = counts.crossJoin(F.broadcast(mx)).select(
        group_col,
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(base_rate)
                * F.pow(
                    F.col("__n").cast("double") / F.col("__mx"),
                    F.lit(tau - 1.0),
                ),
            ),
            6,
        ).alias("keep_rate"),
    )
    draw = F.conv(
        hash_bucket_hex(
            F.concat(F.lit(seed), F.col(key_col).cast("string"))
        ),
        16,
        10,
    ).cast("double")
    return (
        df.where(F.col(key_col).isNotNull())
        .join(F.broadcast(rates), group_col)
        .where(draw < F.col("keep_rate") * F.lit(float(_SCALE)))
    )


def uniform_sample_n(
    df: DataFrame, n: int, key_col: str = "doc_id", *, seed: str = ""
) -> DataFrame:
    """EXACTLY ``n`` rows, uniform over the whole table, reproducible:
    the global top-n by ``md5(seed || key)`` (ties to the smallest
    key). Complements ``hash_sample`` (fraction, approximate count)
    and ``cap_per_group`` (per-group cap) with the "give me exactly
    100k eval docs" primitive.

    Scale: orderBy+limit compiles to TakeOrderedAndProject — each
    partition keeps a local n-heap, the driver merges heaps; no global
    sort, no full shuffle, O(n) driver memory. Deterministic across
    runs, engines, and partitionings because the order key is a pure
    row function.
    """
    draw = hash_bucket_hex(
        F.concat(F.lit(seed), F.col(key_col).cast("string")), digits=16
    )
    return (
        df.withColumn("__draw", draw)
        .orderBy(F.col("__draw"), F.col(key_col))
        .limit(n)
        .drop("__draw")
    )


def cluster_balanced_sample(
    embeddings: DataFrame,
    n_per_cell: int,
    *,
    n_centroids: int = 8,
    refine_iters: int = 1,
    id_col: str = "vec_id",
) -> DataFrame:
    """Diversity-stratified downsample over EMBEDDING space: cluster
    the corpus with the IVF coarse quantizer (``similarity.ivf_train``
    — deterministic seeded k-means), then keep at most ``n_per_cell``
    rows per cell by the ``cap_per_group`` md5 order. Where
    ``temperature_sample`` rebalances across a LABELED group column,
    this balances across LEARNED semantic regions — the "don't let one
    topic dominate the mixture" curation step (cluster-balanced
    sampling, as in DoReMi-style domain reweighting but unsupervised).
    Returns (id, cid) for the kept rows.

    Scale: clustering cost is ivf_train's (one corpus pass per Lloyd
    step); assignment is a broadcast of the tiny centroid table; the
    cap is a cell-partitioned window — never global. The quantizer is
    re-trained here for self-containment; at 100 TB reuse a persisted
    one (``pipelines/ivf_index``) and this becomes one scan."""
    from .similarity import ivf_assign, ivf_train

    cent = ivf_train(embeddings, n_centroids, refine_iters).localCheckpoint(
        eager=True
    )
    assigned = ivf_assign(embeddings, cent)
    return cap_per_group(assigned, ["cid"], n_per_cell, id_col=id_col).select(
        id_col, "cid"
    )


def weighted_sample_n(
    df: DataFrame,
    n: int,
    weight_col: str,
    key_col: str = "doc_id",
    *,
    seed: str = "",
) -> DataFrame:
    """EXACTLY ``n`` rows sampled WITHOUT replacement with probability
    proportional to ``weight_col`` — Efraimidis & Spirakis A-Res
    ("Weighted random sampling with a reservoir", IPL 2006): each row
    draws a deterministic uniform ``u`` from ``md5(seed || key)`` and
    keeps priority ``u^(1/w)``; the n largest priorities ARE a
    weight-proportional sample. Computed as ``ln(u)/w`` (monotone in
    ``u^(1/w)``, numerically safer) and rounded to 6dp so an external
    SQL engine lands on the same side of every comparison; ties break
    to the smallest key.

    The training-mixture primitive behind "sample 1M documents
    proportional to token count" — heavier docs are proportionally
    likelier, but nothing is drawn twice (temperature_sample keeps a
    per-GROUP rate; this weights per ROW and hits an exact count).

    Scale: same shape as ``uniform_sample_n`` — the priority is a pure
    per-row expression on the scan, orderBy+limit compiles to
    TakeOrderedAndProject (per-partition n-heaps, O(n) driver merge);
    no shuffle of the data, no window. Rows with NULL keys or
    non-positive/NULL weights are dropped (no defined draw/priority).
    """
    u = (
        F.conv(
            hash_bucket_hex(
                F.concat(F.lit(seed), F.col(key_col).cast("string"))
            ),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(16 ** 8))
    pr = F.round(F.log(u) / F.col(weight_col).cast("double"), 6)
    return (
        df.where(F.col(key_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__pr", pr)
        .orderBy(F.col("__pr").desc(), F.col(key_col))
        .limit(n)
        .drop("__pr")
    )


def leakage_safe_split(
    df: DataFrame,
    entity_col: str,
    *,
    fractions: tuple[float, float] = (0.8, 0.1),
    names: tuple[str, str, str] = ("train", "val", "test"),
    seed: str = "split",
) -> DataFrame:
    """Entity-disjoint train/val/test assignment: EVERY row of an
    entity (conversation, user, document) lands in the SAME split —
    the group-level split that prevents train/test leakage through
    shared context (turns of one conversation straddling splits is the
    classic eval-contamination bug). ``fractions`` are the train and
    val shares; test gets the remainder.

    Assignment is a pure per-row expression: the md5 hex draw of
    ``seed || entity`` against ``threshold_hex`` boundaries —
    deterministic, engine-portable (lexicographic compare on lowercase
    hex), and entity-consistent BY CONSTRUCTION (the draw input is the
    entity key alone), so no shuffle, no window, no entity table join.
    Rows with a NULL entity get NULL split (filter or expect them
    upstream).

    Scale: a literal-threshold CASE on the scan — whole-stage codegen,
    zero exchanges; works identically on 10^2 or 10^10 rows.
    """
    f_train, f_val = fractions
    if not (0.0 <= f_train and 0.0 <= f_val and f_train + f_val <= 1.0):
        raise ValueError(f"bad fractions {fractions}")
    t1 = threshold_hex(f_train)
    t2 = threshold_hex(f_train + f_val)
    draw = hash_bucket_hex(
        F.concat(F.lit(seed), F.col(entity_col).cast("string"))
    )
    split = (
        F.when(F.col(entity_col).isNull(), F.lit(None).cast("string"))
        .when(draw < F.lit(t1), F.lit(names[0]))
        .when(draw < F.lit(t2), F.lit(names[1]))
        .otherwise(F.lit(names[2]))
    )
    return df.withColumn("split", split)


def mixture_plan(
    df: DataFrame,
    group_col: str,
    size_col,
    *,
    alpha: float = 0.5,
    target_total: int = 1_000_000,
) -> DataFrame:
    """Corpus mixture plan: per-source sampling weights and epoch
    (repetition) factors for a token-budgeted training mix.

    The standard multi-source recipe (GPT-3 / Pile-style mixing):
    source ``s`` with ``n_s`` tokens gets weight
    ``w_s = n_s^alpha / sum_t n_t^alpha`` — ``alpha=1`` is natural
    proportions, ``alpha=0`` is uniform, ``alpha=0.5`` (default)
    up-weights small high-quality sources without drowning in the
    biggest crawl. ``planned_tokens = round(target_total * w_s)`` and
    ``epochs = planned / n_s`` says how many passes over each source
    the budget implies (epochs > 1 = repetition, the overfitting
    signal to watch).

    ``size_col`` is a column name or Column measuring each row's size
    (token count, chars). Weights are rounded to 6dp BEFORE the
    planned-token multiply so every engine lands on the same integers
    (same boundary discipline as :func:`temperature_sample`).

    Scale: one hash aggregation over the corpus (map-side partial
    sums), then arithmetic on the tiny per-source frame against one
    broadcast scalar — no second pass over the data.
    """
    size = F.col(size_col) if isinstance(size_col, str) else size_col
    per = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(size).cast("long").alias("n_tokens"),
    )
    z = per.agg(
        F.sum(F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))).alias("__z")
    )
    weight = F.round(
        F.pow(F.col("n_tokens").cast("double"), F.lit(alpha)) / F.col("__z"), 6
    )
    return (
        per.crossJoin(F.broadcast(z))
        .withColumn("weight", weight)
        .withColumn(
            "planned_tokens",
            F.round(F.lit(float(target_total)) * F.col("weight"), 0)
            .cast("long"),
        )
        .withColumn(
            "epochs",
            F.round(
                F.col("planned_tokens") / F.col("n_tokens").cast("double"), 4
            ),
        )
        .drop("__z")
    )


def materialize_mixture(
    docs: DataFrame,
    plan: DataFrame,
    group_col: str,
    id_col: str = "doc_id",
    *,
    seed: str = "",
) -> DataFrame:
    """Materialize a :func:`mixture_plan`: emit each document
    ``epochs``-many times — ``floor(epochs)`` guaranteed copies plus
    one more with probability ``frac(epochs)``, decided by a
    deterministic per-(doc, copy) hash draw. The realized per-source
    token mass converges to ``planned_tokens`` while every individual
    decision is a pure function of (seed, doc id, copy index): re-runs
    and re-partitions emit the IDENTICAL multiset, so a training-mix
    export is resumable and auditable.

    Output: the input row + ``copy`` (0-based epoch index). Plan shape
    at scale: the plan is a tiny per-source frame (broadcast join), the
    copy fan-out is a per-row ``posexplode(sequence(...))`` — one scan,
    no shuffle beyond the explode, and the fractional draw is the same
    md5-prefix threshold the rest of the sampling suite uses (both
    engines reproduce it bit-for-bit). The per-row threshold is built
    with ``conv``/``lpad`` (8 hex digits, capped at 16^8 - 1 so a
    frac that rounds to 1.0 still compares lexicographically).
    Reference analog: none (training-mix extension, north rule)."""
    full = F.floor(F.col("epochs")).cast("int")
    frac = F.col("epochs") - F.floor(F.col("epochs"))
    thr = F.lpad(
        F.lower(
            F.conv(
                F.least(
                    F.round(frac * _SCALE, 0).cast("long"),
                    F.lit(_SCALE - 1),
                ).cast("string"),
                10,
                16,
            )
        ),
        8,
        "0",
    )
    p = F.broadcast(
        plan.select(group_col, full.alias("__full"), thr.alias("__thr"))
    )
    joined = docs.join(p, group_col)
    draw = F.substring(
        F.md5(
            F.concat(
                F.lit(seed),
                F.col(id_col).cast("string"),
                F.lit(":"),
                F.col("copy").cast("string"),
            )
        ),
        1,
        8,
    )
    return (
        joined.select(
            *docs.columns,
            "__full",
            "__thr",
            F.explode(F.sequence(F.lit(0), F.col("__full"))).alias("copy"),
        )
        .where((F.col("copy") < F.col("__full")) | (draw < F.col("__thr")))
        .drop("__full", "__thr")
    )
