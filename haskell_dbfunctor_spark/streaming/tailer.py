"""Structured-Streaming skin over the CDC apply loop.

The reference is batch-only (SURVEY.md §2.10); the north rule's
"binlog/WAL tail" is a change-event *file* feed tailed continuously.
This module runs the exact same epoch-apply (`LakeTable.merge`) under
`readStream` + `foreachBatch`: each micro-batch is one commit epoch.

Exactly-once comes from two independent layers:
- Spark's streaming checkpoint (offset log) replays a failed batch with
  the same ``batch_id``;
- the lake manifest records ``stream-{batch_id}`` as an applied epoch,
  so a replayed batch is a no-op MERGE (idempotent sink — the same
  contract Iceberg's ``commit.retry`` + snapshot-id check gives).

Late/duplicate events inside a batch collapse via the merge's
last-writer-wins dedup on (ts, seq); late events across batches are
harmless because MERGE is state-convergent: an older (ts, seq) arriving
after a newer one loses inside its own batch's dedup, and would need a
``matched_filter`` on ts to also lose against already-applied state —
which ``lww_matched_filter`` provides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F, types as T

from ..lake.table import LakeTable


def lww_matched_filter(order_cols: str | tuple = ("ts",)) -> Column:
    """Matched rows only update when the source is not older than the
    target (cross-batch last-writer-wins for out-of-order feeds).

    With multiple order columns the comparison is lexicographic via a
    struct compare, so a cross-batch tie on ts falls back to the
    sequence id — the same (ts, seq) total order the in-batch dedup
    uses (lake/table.py max_by)."""
    cols = (order_cols,) if isinstance(order_cols, str) else tuple(order_cols)
    # target-side columns may be NULL for order cols the table never
    # stored (e.g. seq is dropped by default) — compare only the ones
    # present on both sides at merge time; merge() handles that by
    # passing the intersection. Here we build the struct compare as
    # given.
    if len(cols) == 1:
        return F.col(f"t.{cols[0]}") <= F.col(f"s.{cols[0]}")
    return F.struct(*[F.col(f"t.{c}") for c in cols]) <= F.struct(
        *[F.col(f"s.{c}") for c in cols]
    )


def await_or_raise(query, timeout_s: int) -> None:
    """awaitTermination that FAILS LOUDLY on timeout: the default
    returns False and callers who then read the sink get a silently
    partial (mid-stream) result. Stops the query before raising."""
    if not query.awaitTermination(timeout_s):
        query.stop()
        raise TimeoutError(
            f"streaming query did not drain within {timeout_s}s "
            "(host contention or a stuck source); sink contents are "
            "not final"
        )


def feed_schema_from_table(
    table: LakeTable,
    *,
    op_col: str | None = "op",
    order_cols: tuple = ("ts", "seq"),
) -> T.StructType:
    """Reader schema for a change feed derived from the table manifest:
    table columns + the op column (string) + any order columns not in
    the table schema (long). Lets the tailer start on an EMPTY feed
    directory — the normal initial state of a production WAL tail —
    where schema inference from the directory would throw. Pass an
    explicit schema to ``tail_feed_dir`` if the feed diverges (e.g.
    int32 sequence ids)."""
    fields = list(table.schema.fields)
    names = {f.name for f in fields}
    for c in order_cols:
        if c not in names:
            fields.append(T.StructField(c, T.LongType(), True))
            names.add(c)
    if op_col and op_col not in names:
        fields.append(T.StructField(op_col, T.StringType(), True))
    return T.StructType(fields)


def tail_feed_dir(
    spark: SparkSession,
    table: LakeTable,
    feed_dir: str,
    *,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    op_col: str = "op",
    order_cols: tuple = ("ts", "seq"),
    cross_batch_lww: bool = True,
    schema: T.StructType | None = None,
    expectations: dict | None = None,
    mode: str = "cow",
    rollup: LakeTable | None = None,
    catalog=None,
    rollup_group_cols: tuple = ("role",),
    dedup_index: LakeTable | None = None,
    dedup_index_mode: str = "cow",
    term_index: LakeTable | None = None,
    term_index_mode: str = "cow",
    export_manifest: bool = False,
    source: DataFrame | None = None,
    agg_view: LakeTable | None = None,
    agg_view_group_cols: tuple = ("role",),
    agg_view_specs: tuple = (),
    agg_view_mode: str = "cow",
):
    """Tail a directory of change-event parquet files into the table.

    Returns the started StreamingQuery. ``available_now=True`` drains
    everything currently in the directory then stops (bounded test /
    catch-up mode); False tails forever (the production WAL tail).

    ``cross_batch_lww`` (default True) applies ``lww_matched_filter``
    on the first order column, so a late/out-of-order WAL file landing
    in a later micro-batch can never overwrite newer already-committed
    state. Set False ONLY for feeds whose files are strictly ordered
    (saves the filter's column compare per matched row).

    ``schema`` overrides the reader schema; default derives it from
    the table manifest (``feed_schema_from_table``), which also works
    when ``feed_dir`` is still empty at startup.

    Schema evolution on a LIVE tail: a file-source stream's schema is
    fixed at start, so a feed file that gains a new column mid-stream
    has that column silently ignored until the tail is RESTARTED (the
    checkpoint makes the restart exactly-once; the first post-restart
    merge evolves the table schema). This is the standard Structured
    Streaming contract — the batch replay path (cdc/apply.py) evolves
    per epoch without restarts.

    ``rollup`` (+ ``catalog``, a ``lake.transaction.Catalog``): each
    micro-batch becomes a MULTI-TABLE TRANSACTION committing the state
    merge and a CDF-incremental refresh of the per-``rollup_group_cols``
    rollup atomically (same mechanics as ``cdc.apply.replay``'s rollup
    mode). Exactly-once extends across both tables: a replayed
    batch_id stages nothing and aborts its empty transaction, and a
    crash between the commit decision and the publishes is rolled
    forward by the next batch's (or any reader's) catalog recovery.

    ``dedup_index`` (requires ``catalog``): likewise maintains the
    MinHash/LSH signature index (pipelines/dedup_index.py) per
    micro-batch in the same transaction; under ``cross_batch_lww`` the
    index merge applies the same late-batch filter as the state (on
    the order columns the index stores), so state and index never
    disagree about which event's text won.
    """
    if rollup is not None and catalog is None:
        raise ValueError("rollup requires a catalog")
    if dedup_index is not None and catalog is None:
        raise ValueError("dedup_index requires a catalog")
    if term_index is not None and catalog is None:
        raise ValueError("term_index requires a catalog")
    if dedup_index is not None and dedup_index_mode == "mor" and cross_batch_lww:
        # same reasoning as the state-table check below: MoR index
        # refreshes never read the index, so the cross-batch LWW
        # matched filter cannot protect it from late WAL files
        raise ValueError(
            "dedup_index_mode='mor' is latest-commit-wins: pass "
            "cross_batch_lww=False ONLY for strictly ordered feeds"
        )
    if mode == "mor" and cross_batch_lww:
        # MoR applies batches without reading the target, so the
        # matched-filter that implements cross-batch LWW cannot run:
        # a late WAL file in a later micro-batch WOULD override newer
        # committed state. Refuse the unsafe combination loudly.
        raise ValueError(
            "tail_feed_dir(mode='mor') is latest-commit-wins: pass "
            "cross_batch_lww=False ONLY if feed files arrive in strict "
            "order (or keep mode='cow' for out-of-order feeds)"
        )
    if source is not None:
        # pre-built streaming DataFrame (e.g. a Debezium JSONL tail via
        # sources.debezium.stream_debezium_jsonl): the caller owns the
        # reader; everything downstream — per-micro-batch MERGE,
        # exactly-once epoch ids, cross-batch LWW, txn legs — is
        # format-agnostic. feed_dir is still used for the default
        # checkpoint location.
        if not source.isStreaming:
            raise ValueError("tail_feed_dir: source must be a streaming "
                             "DataFrame (readStream)")
        stream = source
    else:
        if schema is None:
            schema = feed_schema_from_table(
                table, op_col=op_col, order_cols=order_cols
            )
        reader = spark.readStream.schema(schema)
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        stream = reader.parquet(feed_dir)

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        mf = None
        if cross_batch_lww:
            # compare only order columns the table actually stores
            # (seq is dropped from the stored row by default)
            stored = [c for c in order_cols if c in table.schema.names]
            mf = lww_matched_filter(tuple(stored) or order_cols[:1])
        merge_opts = dict(
            op_col=op_col,
            order_cols=order_cols,
            matched_filter=mf,
            # per-micro-batch data-quality gate: bad rows quarantine
            # instead of merging (idempotent per stream epoch id)
            expectations=expectations,
            # mor = O(micro-batch) delta appends; schedule
            # compact_deltas out-of-band (maintenance CLI)
            mode=mode,
        )
        eid = f"stream-{batch_id:08d}"
        if rollup is not None or dedup_index is not None \
                or term_index is not None:
            from ..cdc.apply import _txn_epoch

            _txn_epoch(
                table, rollup, catalog, batch, eid, merge_opts,
                rollup_group_cols, int(batch_id),
                dedup_index=dedup_index,
                dedup_index_mode=dedup_index_mode,
                term_index=term_index, term_index_mode=term_index_mode,
            )
        else:
            table.merge(batch, epoch_id=eid, **merge_opts)
        if export_manifest:
            # refresh the external-readers listing after the batch
            # lands; MoR batches with pending deltas legitimately
            # can't export — the next out-of-band compact_deltas +
            # export (lake_maintenance) republishes
            from ..lake.table import LakeError

            try:
                table.export_symlink_manifest()
            except LakeError:
                pass
        if agg_view is not None:
            # async derived aggregate view (lake/agg_view.py): its own
            # sync-vg cursor catches up past any micro-batch boundary,
            # so a crash between state commit and view sync self-heals
            from ..lake.agg_view import sync_agg_view

            sync_agg_view(
                table, agg_view, agg_view_group_cols,
                list(agg_view_specs), mode=agg_view_mode,
            )

    writer = stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation",
        checkpoint_dir or f"{table.root}/_stream_checkpoint",
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
