"""The CDC replay loop: binlog/WAL tail → epoch batches → LWW dedup →
idempotent lake MERGE → checkpoint.

This is the Spark recast of the reference's Extract→Transform→Load
program shape (/root/reference/src/Etl/Julius.hs:67-157,
app/Main.hs:37-77) where Load is ``upsertRTab``
(/root/reference/src/RTable/Core.hs:3649-3735): each epoch is one pure
apply, checkpointed so that re-running any prefix of epochs is a no-op
(the manifest's applied-epochs set IS the checkpoint — committed
atomically with the data, so there is no window where data is visible
but the checkpoint is not: exactly-once under crash/retry).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ..lake.table import LakeError, LakeTable, MergeStats
from .generator import KEY_COLS, TRANSCRIPT_SCHEMA, epoch_batch


def open_or_create_transcripts(
    spark: SparkSession, root: str, num_buckets: int = 32,
    properties: dict[str, str] | None = None,
    row_lineage: bool = False,
    generated_columns: dict[str, str] | None = None,
) -> LakeTable:
    """``generated_columns`` ({name: SQL expr over the transcript
    columns}) extends the created schema with GENERATED ALWAYS AS
    columns — each expr is probed against the base schema to infer
    the column's type, then recomputed by every merge (see
    ``LakeTable.create``). Ignored when the table already exists
    (declarations are create-time-only, Delta's rule)."""
    try:
        return LakeTable.load(spark, root)
    except FileNotFoundError:
        # initial schema intentionally OMITS the nullable `tool` column:
        # it arrives mid-stream via schema evolution (BASELINE.json)
        import pyspark.sql.types as T

        from pyspark.sql import functions as F

        base = T.StructType([f for f in TRANSCRIPT_SCHEMA.fields if f.name != "tool"])
        if generated_columns:
            probe = spark.createDataFrame([], base)
            fields = list(base.fields)
            for g, e in generated_columns.items():
                dt = probe.select(F.expr(e).alias(g)).schema[g].dataType
                fields.append(T.StructField(g, dt, True))
            base = T.StructType(fields)
        return LakeTable.create(
            spark, root, base, key_cols=KEY_COLS, num_buckets=num_buckets,
            properties=properties, row_lineage=row_lineage,
            generated_columns=generated_columns,
        )


@dataclass
class ReplayStats:
    epochs_applied: int = 0
    epochs_skipped: int = 0
    events_applied: int = 0
    seconds: float = 0.0
    manifests_exported: int = 0
    per_epoch: list = field(default_factory=list)

    @property
    def events_per_sec(self) -> float:
        return self.events_applied / self.seconds if self.seconds else 0.0


def open_or_create_rollup(
    spark: SparkSession, root: str, group_cols: list[str]
) -> LakeTable:
    """The derived per-group rollup table maintained transactionally
    with the transcript state: group columns + live row count (+ the
    merge bookkeeping columns ts/seq the refresh batches carry)."""
    try:
        return LakeTable.load(spark, root)
    except FileNotFoundError:
        import pyspark.sql.types as T

        fields = [
            next(f for f in TRANSCRIPT_SCHEMA.fields if f.name == c)
            for c in group_cols
        ]
        schema = T.StructType([
            *fields,
            T.StructField("live_rows", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ])
        return LakeTable.create(
            spark, root, schema, key_cols=list(group_cols), num_buckets=4,
            # group columns may be nullable dimensions (`tool` is NULL
            # pre-evolution); NULL is a legal rollup key value
            nullable_keys=True,
        )


def open_or_create_dedup_index(
    spark: SparkSession, root: str, num_buckets: int = 16,
    hash_family: str = "xxh",
) -> LakeTable:
    """The transcript near-dup signature index (MinHash words/bands
    per turn, pipelines/dedup_index.py) maintained transactionally
    with the state table — keyed exactly like the state (conv_id,
    turn_idx). Defaults to the "xxh" signature family (native
    xxhash64 minhashes — 2.7x faster per pass than the md5 family the
    SQL-oracled document queries pin); the choice is recorded in the
    index's ``dedup.hash_family`` property and an existing index
    keeps its own."""
    try:
        return LakeTable.load(spark, root)
    except FileNotFoundError:
        from ..pipelines.dedup_index import create_dedup_index

        key_fields = [
            f for f in TRANSCRIPT_SCHEMA.fields if f.name in KEY_COLS
        ]
        return create_dedup_index(
            spark, root, num_buckets=num_buckets, key_fields=key_fields,
            hash_family=hash_family,
        )


def open_or_create_term_index(
    spark: SparkSession, root: str, num_buckets: int = 16
) -> LakeTable:
    """The transcript inverted term index (pipelines/term_index.py)
    maintained transactionally with the state table — postings keyed
    (term, conv_id, turn_idx)."""
    try:
        return LakeTable.load(spark, root)
    except FileNotFoundError:
        from ..pipelines.term_index import create_term_index

        key_fields = [
            f for f in TRANSCRIPT_SCHEMA.fields if f.name in KEY_COLS
        ]
        return create_term_index(
            spark, root, key_fields=key_fields, num_buckets=num_buckets,
        )


def replay(
    table: LakeTable,
    feed: DataFrame,
    n_epochs: int,
    *,
    evolution_epoch: int | None = None,
    stop_after: int | None = None,
    files_per_bucket: int = 1,
    prune_buckets: bool | None = None,
    mode: str = "cow",
    compact_every: int | None = None,
    epoch_prefix: str = "epoch",
    expectations: dict | None = None,
    rollup: LakeTable | None = None,
    catalog=None,
    rollup_group_cols: tuple = ("role",),
    dedup_index: LakeTable | None = None,
    dedup_index_mode: str = "cow",
    term_index: LakeTable | None = None,
    term_index_mode: str = "cow",
    forget_dir: str | None = None,
    export_manifest: bool = False,
    agg_view: LakeTable | None = None,
    agg_view_group_cols: tuple = ("role",),
    agg_view_specs: tuple = (),
    agg_view_mode: str = "cow",
    agg_view_every: int = 1,
) -> ReplayStats:
    """Apply epochs [0, n_epochs) in order, resuming past any already
    committed (checkpoint = manifest.applied_epochs). ``stop_after``
    simulates a mid-stream crash for resumability tests.

    ``prune_buckets=None`` decides automatically: a batch with far more
    rows than the table has buckets touches essentially every bucket
    (uniform-hash keys), so the extra job that computes the touched set
    buys nothing — skip it and fuse dedup into the single MERGE job.

    ``mode="mor"`` applies epochs as merge-on-read deltas (O(batch)
    writes, read-side collapse); ``compact_every=K`` folds pending
    deltas into the base every K applied epochs (bounding the read
    tax), mirroring a production compaction schedule.

    ``epoch_prefix`` namespaces the checkpoint ids: replaying a SECOND,
    different feed into the same table with the default prefix would
    silently skip every epoch number the first feed already committed
    — give each logical feed/stream its own prefix.

    ``rollup`` (+ ``catalog``, a lake.transaction.Catalog) switches
    each epoch to a MULTI-TABLE TRANSACTION: the state merge and a
    CDF-incremental refresh of the per-``rollup_group_cols`` row-count
    rollup become visible atomically or not at all — a reader joining
    state to rollup never sees them one epoch apart. The refresh is
    maintained from the epoch's published→staged diff (O(changes), no
    state rescan) and resumability is unchanged: the state epoch id is
    still the checkpoint, and a resumed already-applied epoch aborts
    its (empty) transaction.

    ``dedup_index`` (requires ``catalog``) likewise maintains a
    MinHash/LSH signature index over the transcript ``text``
    (pipelines/dedup_index.py, keyed like the state table) inside the
    same per-epoch transaction: signatures are recomputed only for the
    epoch's net changes (post-image CDF diff — quarantined rows never
    reach the index), deletes and text-degenerate rows drop index
    entries, and a reader joining state to index never sees them one
    epoch apart.

    ``term_index`` (requires ``catalog``) maintains the inverted
    postings index (pipelines/term_index.py, keyed (term, conv_id,
    turn_idx)) in the same transaction: new postings upsert, and the
    CDF pre-images supply the OLD term set so stale (term, doc) rows
    delete without ever reading the index back — O(changed turns x
    terms/turn) per epoch.

    ``forget_dir`` (requires ``catalog``) drains a right-to-be-
    forgotten request queue after every epoch (lake/forget.py):
    each request file deletes its data subjects from the state AND
    every derived table above in one transaction, so a forget is
    honored within one epoch of arriving. NOTE the ordering contract:
    a change event for a forgotten key arriving in a LATER epoch
    re-inserts it — blocklist the keys upstream.

    ``agg_view`` (+ ``agg_view_specs``, lake/agg_view.py AggSpec
    tuple) maintains a persisted incremental aggregate view off the
    state table's CDF after every applied epoch — the ASYNC derived
    path (its own ``sync-vg`` cursor, its own commit; crash between
    state commit and view sync self-heals on the next epoch's
    catch-up). ``agg_view_every=K`` syncs every K applied epochs (and
    once after the last): the sync reads the NET window diff, so K
    epochs cost ONE bucket-pruned diff — the amortization knob for
    dense-touch feeds (BENCH.md agg-view-cost). Use the transactional
    ``rollup`` leg instead when a reader must never see state and
    rollup one epoch apart.
    """
    if rollup is not None and catalog is None:
        raise ValueError("rollup requires a catalog")
    if dedup_index is not None and catalog is None:
        raise ValueError("dedup_index requires a catalog")
    if term_index is not None and catalog is None:
        raise ValueError("term_index requires a catalog")
    if forget_dir is not None and catalog is None:
        raise ValueError("forget_dir requires a catalog")

    def _drain_forgets():
        # right-to-be-forgotten queue (lake/forget.py): requests
        # dropped into forget_dir are honored within one epoch, each
        # as its own multi-table transaction over the SAME derived
        # tables this replay maintains
        if forget_dir is None:
            return
        from ..lake.forget import drain_forget_dir

        drain_forget_dir(
            catalog, table, forget_dir,
            rollup=rollup, rollup_group_cols=rollup_group_cols,
            dedup_index=dedup_index, dedup_index_mode=dedup_index_mode,
            term_index=term_index, term_index_mode=term_index_mode,
            mode=mode,
        )
    t0 = time.time()
    if prune_buckets is None:
        # one count() over the feed: on the materialized parquet WAL
        # this is a metadata-only job (row counts from footers, no data
        # read) — cheap even at 10^10 events; pass prune_buckets
        # explicitly for feeds where counting is not metadata-backed
        avg_epoch_rows = feed.count() / max(n_epochs, 1)
        prune_buckets = avg_epoch_rows < 50 * table.num_buckets
    stats = ReplayStats()
    merge_opts = dict(
        op_col="op",
        order_cols=("ts", "seq"),
        files_per_bucket=files_per_bucket,
        prune_buckets=prune_buckets,
        mode=mode,
        expectations=expectations,
    )
    for e in range(n_epochs):
        eid = f"{epoch_prefix}-{e:05d}"
        batch = epoch_batch(feed, e, evolution_epoch=evolution_epoch)
        if rollup is not None or dedup_index is not None \
                or term_index is not None:
            m = _txn_epoch(
                table, rollup, catalog, batch, eid, merge_opts,
                rollup_group_cols, e, dedup_index=dedup_index,
                dedup_index_mode=dedup_index_mode,
                term_index=term_index, term_index_mode=term_index_mode,
            )
        else:
            m = table.merge(batch, epoch_id=eid, **merge_opts)
        if m.skipped:
            stats.epochs_skipped += 1
        else:
            stats.epochs_applied += 1
            stats.events_applied += m.n_source
            if compact_every and stats.epochs_applied % compact_every == 0:
                if mode == "dv":
                    # fold accumulated deletion vectors + trickle
                    # appends back into clean key-unique base files
                    table.compact(dv_ratio=0.0)
                else:
                    table.compact_deltas()
                if dedup_index is not None and dedup_index_mode == "mor":
                    dedup_index.compact_deltas()
                if term_index is not None and term_index_mode == "mor":
                    term_index.compact_deltas()
            if export_manifest:
                # refresh the external-readers listing after the epoch
                # lands; a MoR epoch with pending deltas legitimately
                # can't export (raw parquet would skip the collapse) —
                # the next compaction epoch republishes
                try:
                    table.export_symlink_manifest()
                    stats.manifests_exported += 1
                except LakeError:
                    pass
        if agg_view is not None and not m.skipped \
                and stats.epochs_applied % max(agg_view_every, 1) == 0:
            from ..lake.agg_view import sync_agg_view

            sync_agg_view(
                table, agg_view, agg_view_group_cols,
                list(agg_view_specs), mode=agg_view_mode,
            )
        stats.per_epoch.append(m)
        _drain_forgets()
        if stop_after is not None and stats.epochs_applied >= stop_after:
            break
    if agg_view is not None:
        # final catch-up: with agg_view_every > 1 the last epochs may
        # not have landed a sync; one net-diff sync closes the gap
        # (no-op when already current). Runs even when THIS replay
        # applied zero new epochs: a crash between the last epoch's
        # state commit and its view sync, followed by a resume where
        # every epoch is already applied, must still bring the view
        # current — the cursor check makes the already-current case a
        # cheap metadata no-op (ADVICE r03)
        from ..lake.agg_view import sync_agg_view

        sync_agg_view(
            table, agg_view, agg_view_group_cols,
            list(agg_view_specs), mode=agg_view_mode,
        )
    stats.seconds = time.time() - t0
    return stats


def _txn_epoch(
    table: LakeTable,
    rollup: LakeTable | None,
    catalog,
    batch: DataFrame,
    eid: str,
    merge_opts: dict,
    group_cols: tuple,
    e: int,
    *,
    dedup_index: LakeTable | None = None,
    dedup_index_mode: str = "cow",
    term_index: LakeTable | None = None,
    term_index_mode: str = "cow",
) -> MergeStats:
    """One epoch as a multi-table transaction: stage the state merge,
    derive each enabled derived-table refresh (rollup, dedup index)
    from the epoch's published→staged CDF diff (O(changes)), stage
    them, commit all atomically. An already-applied epoch (resume)
    stages nothing and aborts."""
    from pyspark.sql import functions as F

    from ..lake.incremental import maintain_group_sums

    txn = catalog.begin()
    ah = catalog.read(table.root)
    fork = ah.version
    m = txn.merge(ah, batch, epoch_id=eid, **merge_opts)
    if m.skipped:
        txn.abort()
        return m
    # ONE CDF diff serves every derived leg: the rollup consumes the
    # Delta-CDF preimage contract, the index only post-images (derived
    # below by dropping U_pre and renaming U_post)
    # pre-images serve the rollup's decrement contract AND the term
    # index's old-term delete derivation
    want_pre = rollup is not None or term_index is not None
    ch = ah.changes(fork, preimages=want_pre)
    if rollup is not None:
        rh = catalog.read(rollup.root)
        cur = rh.read().select(
            *group_cols, F.col("live_rows").alias("n")
        )
        chr_ = ch
        for c in group_cols:
            if c not in chr_.columns:
                # a rollup group column that arrives via schema
                # evolution (e.g. `tool`) is absent from pre-evolution
                # change feeds; those rows roll up under the NULL
                # group, exactly as a recompute over the evolved table
                # would place them
                chr_ = chr_.withColumn(
                    c, F.lit(None).cast(rollup.schema[c].dataType)
                )
        refreshed = maintain_group_sums(
            cur, chr_, list(group_cols), [], count_col="n",
        )
        # null-safe anti join: a NULL-keyed group (schema-evolution
        # rows) must match itself, else delete-marked every epoch
        anti_cond = None
        for c in group_cols:
            eq = cur[c].eqNullSafe(refreshed[c])
            anti_cond = eq if anti_cond is None else (anti_cond & eq)
        gone = cur.join(refreshed, anti_cond, "left_anti")
        refresh = (
            refreshed.withColumn("op", F.lit("U"))
            .unionByName(gone.withColumn("op", F.lit("D")))
            .select(
                *group_cols, F.col("n").alias("live_rows"),
                F.timestamp_seconds(
                    F.lit(1_700_000_000) + F.lit(e)
                ).alias("ts"),
                "op", F.lit(e).cast("long").alias("seq"),
            )
        )
        txn.merge(rh, refresh, epoch_id=f"{eid}-rollup", op_col="op",
                  order_cols=("ts", "seq"))
    if dedup_index is not None:
        from ..pipelines.dedup_index import signature_batch

        ih = catalog.read(dedup_index.root)
        if merge_opts.get("expectations"):
            # quarantined rows must never reach the index, so derive
            # its refresh from the POST-GATE CDF diff (shared with the
            # rollup when both legs are on)
            post = ch
            if want_pre:
                post = ch.where(F.col("_change_type") != "U_pre")
            chi = post.withColumn(
                "op",
                F.when(F.col("_change_type") == "D", F.lit("D"))
                .otherwise(F.lit("U")),
            )
            ib = signature_batch(
                chi, ih.key_cols,
                hash_family=ih.properties.get("dedup.hash_family", "md5"),
            ).withColumn("seq", F.lit(e).cast("long"))
            txn.merge(ih, ib, epoch_id=f"{eid}-dedupix", op_col="op",
                      order_cols=("seq",), mode=dedup_index_mode)
        else:
            # no gate: the RAW batch is equivalent (the index merge
            # replays the same LWW order columns, so the winning
            # event's text decides the signature) and skips the
            # two-snapshot diff read — measured 2.4x cheaper per epoch
            oc = tuple(merge_opts.get("order_cols", ("ts", "seq")))
            op_c = merge_opts.get("op_col", "op")
            src = batch
            if op_c is None:  # pure-upsert feed: no delete leg
                op_c = "__op"
                src = batch.withColumn(op_c, F.lit("U"))
            # LWW-dedup a SLIM projection (keys, op, text, order)
            # BEFORE computing signatures: word arrays are the fat
            # columns, so the merge's bucket shuffle moves only the
            # winners' signatures, not every event's. Wall-clock
            # neutral at bench scale (the extra thin-row shuffle buys
            # back what it costs) but strictly less array bytes moved
            # — the term that grows with hot-key skew at 100 TB. Same
            # hash-agg max_by shape as the merge's own dedup.
            slim = src.select(*ih.key_cols, op_c, "text", *oc)
            ord_struct = (
                F.struct(*[F.col(c) for c in oc]) if oc else F.lit(1)
            )
            win = slim.groupBy(*ih.key_cols).agg(
                *[
                    F.max_by(F.col(c), ord_struct).alias(c)
                    for c in (op_c, "text", *oc)
                ]
            )
            ib = signature_batch(
                win, ih.key_cols, op_col=op_c, carry_cols=oc,
                hash_family=ih.properties.get("dedup.hash_family", "md5"),
            )
            ix_opts = {}
            if (
                merge_opts.get("matched_filter") is not None
                and dedup_index_mode != "mor"
            ):
                # streaming cross-batch LWW: the index must reject the
                # same late batches the state rejects, or a late WAL
                # file would roll a signature back while the state
                # keeps the newer text. Compare on the order columns
                # the index actually stores (ts rides along as a
                # payload column and evolves the schema on first use;
                # until then the index is empty and needs no filter).
                from ..streaming.tailer import lww_matched_filter

                stored = [c for c in oc if c in ih.schema.names]
                if stored:
                    ix_opts["matched_filter"] = lww_matched_filter(
                        tuple(stored)
                    )
            # inherit the state merge's prune decision: an index batch
            # fans out >= the state batch, so whenever the state skips
            # the touched-set job the index must too (saves one Spark
            # job per epoch; tiny batches keep pruning)
            ix_opts.setdefault(
                "prune_buckets", merge_opts.get("prune_buckets", True)
            )
            txn.merge(ih, ib, epoch_id=f"{eid}-dedupix",
                      op_col=op_c, order_cols=oc, mode=dedup_index_mode,
                      **ix_opts)
    if term_index is not None:
        from ..pipelines.term_index import postings_refresh

        # the postings refresh DERIVES old-term deletes from the CDF
        # pre-images, so it always consumes the committed diff (never
        # the raw batch): quarantined rows and cross-batch-LWW-rejected
        # late events simply aren't in the diff — no extra filters
        xh = catalog.read(term_index.root)
        ids = [c for c in xh.key_cols if c != "term"]
        tb = postings_refresh(ch, ids, text_col="text")
        txn.merge(
            xh, tb, epoch_id=f"{eid}-termix", op_col="op",
            order_cols=("seq",), drop_cols=("seq",),
            mode=term_index_mode,
            prune_buckets=merge_opts.get("prune_buckets", True),
        )
    txn.commit()
    # move the caller's handles to the new published head so post-loop
    # version/read() reflect the commit
    table.manifest = table._load_latest_published_manifest()
    if rollup is not None:
        rollup.manifest = rollup._load_latest_published_manifest()
    if dedup_index is not None:
        dedup_index.manifest = (
            dedup_index._load_latest_published_manifest()
        )
    if term_index is not None:
        term_index.manifest = (
            term_index._load_latest_published_manifest()
        )
    return m
