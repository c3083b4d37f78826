#!/usr/bin/env python
"""spark-submit entry point for the CDC ingest job.

Packaging + launch (multi-executor cluster; local[...] in the sandbox):

    cd /root/repo && zip -r /tmp/hdbf.zip haskell_dbfunctor_spark
    spark-submit --master <cluster> --py-files /tmp/hdbf.zip \
        jobs/cdc_ingest.py --table-root /data/lake/transcripts \
        --events 10000000000 --epochs 1024 --buckets 4096

The job is resumable: applied epoch ids live in the table manifest
(committed atomically with the data), so a killed run re-submitted with
the same arguments skips every already-committed epoch and continues —
the reference's pure, re-runnable `upsertRTab` recast as exactly-once
replay (/root/reference/src/RTable/Core.hs:3649-3735).

With --stream the same apply loop runs as a Structured Streaming file
tailer (see haskell_dbfunctor_spark/streaming/tailer.py) instead of a
bounded epoch loop.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# running from a checkout without --py-files: make the repo root importable
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="CDC ingest: change feed -> lake MERGE")
    ap.add_argument("--table-root", required=True)
    ap.add_argument("--events", type=int, default=1_000_000)
    ap.add_argument("--epochs", type=int, default=16)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--convs", type=int, default=0,
                    help="distinct conversations (0 = events/200)")
    ap.add_argument("--evolution-epoch", type=int, default=None,
                    help="epoch at which the `tool` column first appears")
    ap.add_argument("--stop-after", type=int, default=None,
                    help="apply at most this many new epochs (resume later)")
    ap.add_argument("--mor", action="store_true",
                    help="merge-on-read: append LWW-deduped delta files "
                         "(O(batch) writes) instead of copy-on-write bucket "
                         "rewrites; reads collapse deltas until compaction")
    ap.add_argument("--dv", action="store_true",
                    help="deletion-vector MERGE: matched positions vector "
                         "out, new images append as plain base files — "
                         "O(batch) writes like --mor but reads stay "
                         "collapse-free and cross-batch LWW "
                         "(matched_filter) still evaluates")
    ap.add_argument("--compact-every", type=int, default=None,
                    help="fold pending MoR deltas (or, with --dv, "
                         "deletion vectors + trickle appends) into the "
                         "base every K applied epochs (bounds the read "
                         "tax)")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--stream", action="store_true",
                    help="tail --feed-dir with Structured Streaming instead "
                         "of replaying the synthetic feed")
    ap.add_argument("--feed-dir", default=None,
                    help="directory of change-event parquet files (--stream)")
    ap.add_argument("--feed-format", default="parquet",
                    choices=["parquet", "debezium"],
                    help="--stream feed encoding: native change-event "
                         "parquet, or Debezium JSONL envelopes (one JSON "
                         "envelope per line — before/after images, op "
                         "c/u/d/r, source.lsn as the seq tiebreak; "
                         "sources/debezium.py parses JVM-side)")
    ap.add_argument("--no-cross-batch-lww", action="store_true",
                    help="skip the cross-batch last-writer-wins matched "
                         "filter; ONLY safe when feed files arrive in "
                         "strict order (saves one compare per matched row)")
    ap.add_argument("--rollup-root", default=None,
                    help="maintain a derived per-group rollup table at "
                         "this root, committed ATOMICALLY with each "
                         "state epoch via a multi-table transaction "
                         "(lake/transaction.py); refreshed "
                         "incrementally from the epoch's change feed")
    ap.add_argument("--rollup-by", default="role",
                    help="comma-separated transcript columns the rollup "
                         "groups by (default: role)")
    ap.add_argument("--dedup-index-root", default=None,
                    help="maintain a MinHash/LSH near-dup signature "
                         "index over transcript text at this root, "
                         "committed atomically with each state epoch "
                         "or micro-batch (pipelines/dedup_index.py)")
    ap.add_argument("--dedup-index-mor", action="store_true",
                    help="apply dedup-index refreshes as merge-on-read "
                         "deltas (O(batch) index writes; pair with "
                         "--compact-every to bound the read tax)")
    ap.add_argument("--term-index-root", default=None,
                    help="maintain an inverted term (postings) index "
                         "over transcript text at this root, committed "
                         "atomically with each state epoch or "
                         "micro-batch (pipelines/term_index.py); old "
                         "terms delete via CDF pre-images")
    ap.add_argument("--term-index-mor", action="store_true",
                    help="apply term-index refreshes as merge-on-read "
                         "deltas")
    ap.add_argument("--expect", action="append", default=[],
                    metavar="NAME=SQL",
                    help="data-quality expectation (repeatable): rows "
                         "failing the SQL boolean expression are "
                         "quarantined instead of merged, e.g. "
                         "--expect 'text_present=text IS NOT NULL'")
    ap.add_argument("--epoch-retention", type=int, default=0,
                    help="keep only the newest N applied-epoch ids in "
                         "the manifest (bounds metadata growth on "
                         "long-running streams; re-delivery older than "
                         "the window is NOT deduplicated — size above "
                         "the max replay window). 0 = unlimited. "
                         "Applies at table creation.")
    ap.add_argument("--agg-view-root", default=None,
                    help="maintain a persisted incremental aggregate "
                         "view (lake/agg_view.py) at this root after "
                         "every epoch/micro-batch: per --agg-view-by "
                         "group, live row count + first/last ts + max "
                         "turn_idx; async leg with its own sync-vg "
                         "cursor (crash-safe catch-up)")
    ap.add_argument("--agg-view-by", default="role",
                    help="comma-separated group columns for "
                         "--agg-view-root (default: role)")
    ap.add_argument("--agg-view-mor", action="store_true",
                    help="apply agg-view syncs as merge-on-read deltas")
    ap.add_argument("--agg-view-every", type=int, default=1,
                    help="sync the agg view every K applied epochs "
                         "(replay mode; the sync reads the NET window "
                         "diff, so K epochs cost one diff)")
    ap.add_argument("--codec", default=None,
                    help="write.compression-codec table property "
                         "(snappy|zstd|gzip|lz4|uncompressed); applies "
                         "at table creation, per-file safe thereafter")
    ap.add_argument("--meta-spill-bytes", type=int, default=None,
                    help="inline-manifest size past which the file "
                         "listing spills to per-bucket sidecars "
                         "(two-level manifest; default 4 MiB). "
                         "Applies at table creation.")
    ap.add_argument("--row-lineage", action="store_true",
                    help="create the table with row lineage (hidden "
                         "__row_id / __last_updated_version columns; "
                         "Iceberg-v3 row-lineage analog). Forces CoW "
                         "merges — incompatible with --mor. EPOCH "
                         "BUDGET with --rollup-root: each transactional "
                         "epoch on a lineage table claims one staged "
                         "row-id reservation block, and the table "
                         "lifetime holds 2^16 blocks — a lineage+rollup "
                         "pipeline supports at most 65,536 epochs / "
                         "micro-batches before requiring a table "
                         "rebuild. Size --stream trigger intervals "
                         "accordingly (e.g. minutes, not sub-second).")
    ap.add_argument("--forget-dir", default=None,
                    help="right-to-be-forgotten request queue "
                         "(lake/forget.py): JSON files of key rows "
                         "dropped here are honored within one epoch — "
                         "each deletes its data subjects from the "
                         "state AND every maintained derived table "
                         "(rollup / dedup index / term index) in one "
                         "multi-table transaction (replay mode only)")
    ap.add_argument("--generated", action="append", default=[],
                    help="NAME=SQL generated column (GENERATED ALWAYS "
                         "AS): computed from the row's other columns "
                         "by every merge; type inferred from the "
                         "expr. Applies at table creation only. "
                         "Repeatable.")
    ap.add_argument("--export-manifest", action="store_true",
                    help="after each applied epoch, refresh the "
                         "symlink-format manifest export (external "
                         "engines read the table as plain parquet; "
                         "MoR epochs with pending deltas skip — the "
                         "next --compact-every fold republishes). "
                         "Replay and --stream modes.")
    ap.add_argument("--auto-stats-cols", default=None,
                    help="comma-separated columns whose per-file "
                         "min/max bounds every merge/compaction "
                         "collects at write time (stats.auto-columns "
                         "property — read_where pruning stays fresh "
                         "with no analyze pass; e.g. 'ts' for "
                         "retention scans). Applies at table creation.")
    args = ap.parse_args(argv)

    table_props: dict[str, str] = {}
    if args.codec:
        # fail at arg-parse time, not silently at write time: create()
        # validates too, but an EXISTING table path never calls create
        from haskell_dbfunctor_spark.lake.table import (
            validate_compression_codec,
        )

        table_props["write.compression-codec"] = args.codec
        try:
            validate_compression_codec(table_props, where="--codec")
        except Exception as ex:
            ap.error(str(ex))
    if args.epoch_retention:
        table_props["epochs.retention-count"] = str(args.epoch_retention)
    if args.meta_spill_bytes is not None:
        table_props["metadata.spill-bytes"] = str(args.meta_spill_bytes)
    if args.auto_stats_cols:
        table_props["stats.auto-columns"] = args.auto_stats_cols

    from haskell_dbfunctor_spark.session import get_spark
    from haskell_dbfunctor_spark.cdc.apply import open_or_create_transcripts, replay
    from haskell_dbfunctor_spark.cdc.generator import change_feed

    spark = get_spark(app_name="cdc-ingest")
    if args.mor and args.dv:
        ap.error("--mor and --dv are mutually exclusive merge modes")
    # row lineage works under all three merge modes (CoW carry-over,
    # MoR provisional-id resolution, DV direct carry from the matched
    # target scan) — no mode restriction
    gen_cols = None
    if args.generated:
        gen_cols = {}
        for item in args.generated:
            name, _, expr = item.partition("=")
            if not name or not expr:
                ap.error(f"--generated needs NAME=SQL, got {item!r}")
            gen_cols[name] = expr
    table = open_or_create_transcripts(
        spark, args.table_root, num_buckets=args.buckets,
        properties=table_props or None,
        row_lineage=args.row_lineage,
        generated_columns=gen_cols,
    )

    expectations = None
    if args.expect:
        from pyspark.sql import functions as F

        expectations = {}
        for item in args.expect:
            name, _, expr = item.partition("=")
            if not name or not expr:
                ap.error(f"--expect needs NAME=SQL, got {item!r}")
            expectations[name] = F.expr(expr)

    agg_view = None
    agg_view_gcols: tuple = ("role",)
    agg_view_specs: tuple = ()
    if args.agg_view_root:
        from haskell_dbfunctor_spark.lake.agg_view import (
            Max, Min, open_or_create_agg_view,
        )

        agg_view_gcols = tuple(
            c.strip() for c in args.agg_view_by.split(",") if c.strip()
        )
        # freshness + depth per group: first/last event time and the
        # deepest turn — the ops rollup a transcript feed is watched by
        agg_view_specs = (
            Min("ts", "first_ts"), Max("ts", "last_ts"),
            Max("turn_idx", "max_turn"),
        )
        agg_view = open_or_create_agg_view(
            spark, args.agg_view_root, table,
            list(agg_view_gcols), list(agg_view_specs),
        )

    if args.stream:
        from haskell_dbfunctor_spark.streaming.tailer import tail_feed_dir

        if not args.feed_dir:
            ap.error("--stream requires --feed-dir")
        if args.forget_dir:
            ap.error("--forget-dir is replay-mode only; for a running "
                     "stream, drain the queue from a sidecar process "
                     "(lake.forget.drain_forget_dir — forgets are "
                     "their own transactions, safe beside the tailer)")
        rollup = catalog = dedup_index = term_index = None
        if args.rollup_root:
            from haskell_dbfunctor_spark.cdc.apply import (
                open_or_create_rollup,
            )
            from haskell_dbfunctor_spark.lake.transaction import Catalog

            group_cols = [
                c.strip() for c in args.rollup_by.split(",") if c.strip()
            ]
            rollup = open_or_create_rollup(
                spark, args.rollup_root, group_cols
            )
            catalog = Catalog(
                spark,
                os.path.join(
                    os.path.dirname(args.rollup_root) or ".", "_catalog"
                ),
            )
        if args.dedup_index_root:
            from haskell_dbfunctor_spark.cdc.apply import (
                open_or_create_dedup_index,
            )
            from haskell_dbfunctor_spark.lake.transaction import Catalog

            dedup_index = open_or_create_dedup_index(
                spark, args.dedup_index_root
            )
            if catalog is None:
                catalog = Catalog(
                    spark,
                    os.path.join(
                        os.path.dirname(args.dedup_index_root) or ".",
                        "_catalog",
                    ),
                )
        if args.term_index_root:
            from haskell_dbfunctor_spark.cdc.apply import (
                open_or_create_term_index,
            )
            from haskell_dbfunctor_spark.lake.transaction import Catalog

            term_index = open_or_create_term_index(
                spark, args.term_index_root
            )
            if catalog is None:
                catalog = Catalog(
                    spark,
                    os.path.join(
                        os.path.dirname(args.term_index_root) or ".",
                        "_catalog",
                    ),
                )
        source = None
        if args.feed_format == "debezium":
            from haskell_dbfunctor_spark.sources.debezium import (
                stream_debezium_jsonl,
            )

            # the table manifest carries the value schema; seq rides in
            # from source.lsn, so the parsed stream already matches the
            # tailer's (value columns + op + seq) contract
            source = stream_debezium_jsonl(
                spark, args.feed_dir, table.schema
            )
        # cross_batch_lww defaults True: a late WAL file applied in a
        # later micro-batch must not overwrite newer committed state
        q = tail_feed_dir(spark, table, args.feed_dir, source=source,
                          cross_batch_lww=not args.no_cross_batch_lww,
                          expectations=expectations,
                          # --mor + --stream = delta-append micro-batches;
                          # tail_feed_dir refuses it without
                          # --no-cross-batch-lww (ordered-feed contract)
                          mode="mor" if args.mor
                          else "dv" if args.dv else "cow",
                          rollup=rollup, catalog=catalog,
                          rollup_group_cols=tuple(group_cols)
                          if rollup is not None else ("role",),
                          dedup_index=dedup_index,
                          dedup_index_mode="mor" if args.dedup_index_mor
                          else "cow",
                          term_index=term_index,
                          term_index_mode="mor" if args.term_index_mor
                          else "cow",
                          export_manifest=args.export_manifest,
                          agg_view=agg_view,
                          agg_view_group_cols=agg_view_gcols,
                          agg_view_specs=agg_view_specs,
                          agg_view_mode="mor" if args.agg_view_mor
                          else "cow")
        q.awaitTermination()
        out = {"mode": "stream", "status": "drained"}
        if rollup is not None:
            out["rollup_rows"] = rollup.read().count()
        if dedup_index is not None:
            out["dedup_index_rows"] = dedup_index.read().count()
        if term_index is not None:
            out["term_index_rows"] = term_index.read().count()
        if agg_view is not None:
            out["agg_view_rows"] = agg_view.read().count()
        print(json.dumps(out))
        return 0

    feed = change_feed(
        spark,
        args.events,
        seed=args.seed,
        n_convs=args.convs or max(args.events // 200, 100),
        n_epochs=args.epochs,
        evolution_epoch=args.evolution_epoch,
    )
    # materialize the synthetic feed once (partition-pruned per-epoch
    # reads; a WAL is storage, not a generator). Deterministic in
    # (seed, events, epochs), so a resumed run reuses it.
    feed_path = os.path.join(args.table_root, "_feed")
    if not os.path.exists(feed_path):
        feed.write.partitionBy("epoch").parquet(feed_path)
    feed = spark.read.parquet(feed_path)
    rollup = catalog = dedup_index = term_index = None
    if args.rollup_root:
        from haskell_dbfunctor_spark.cdc.apply import open_or_create_rollup
        from haskell_dbfunctor_spark.lake.transaction import Catalog

        group_cols = [c.strip() for c in args.rollup_by.split(",") if c.strip()]
        rollup = open_or_create_rollup(spark, args.rollup_root, group_cols)
        catalog = Catalog(
            spark, os.path.join(os.path.dirname(args.rollup_root) or ".",
                                "_catalog")
        )
    if args.dedup_index_root:
        from haskell_dbfunctor_spark.cdc.apply import (
            open_or_create_dedup_index,
        )
        from haskell_dbfunctor_spark.lake.transaction import Catalog

        dedup_index = open_or_create_dedup_index(
            spark, args.dedup_index_root
        )
        if catalog is None:
            catalog = Catalog(
                spark,
                os.path.join(
                    os.path.dirname(args.dedup_index_root) or ".",
                    "_catalog",
                ),
            )
    if args.term_index_root:
        from haskell_dbfunctor_spark.cdc.apply import (
            open_or_create_term_index,
        )
        from haskell_dbfunctor_spark.lake.transaction import Catalog

        term_index = open_or_create_term_index(spark, args.term_index_root)
        if catalog is None:
            catalog = Catalog(
                spark,
                os.path.join(
                    os.path.dirname(args.term_index_root) or ".",
                    "_catalog",
                ),
            )
    if args.forget_dir and catalog is None:
        from haskell_dbfunctor_spark.lake.transaction import Catalog

        catalog = Catalog(
            spark,
            os.path.join(
                os.path.dirname(args.table_root) or ".", "_catalog"
            ),
        )
    stats = replay(
        table, feed, args.epochs,
        forget_dir=args.forget_dir,
        evolution_epoch=args.evolution_epoch,
        stop_after=args.stop_after,
        mode="mor" if args.mor else "dv" if args.dv else "cow",
        compact_every=args.compact_every,
        expectations=expectations,
        rollup=rollup,
        catalog=catalog,
        rollup_group_cols=tuple(group_cols) if rollup is not None else ("role",),
        dedup_index=dedup_index,
        dedup_index_mode="mor" if args.dedup_index_mor else "cow",
        term_index=term_index,
        term_index_mode="mor" if args.term_index_mor else "cow",
        export_manifest=args.export_manifest,
        agg_view=agg_view,
        agg_view_group_cols=agg_view_gcols,
        agg_view_specs=agg_view_specs,
        agg_view_mode="mor" if args.agg_view_mor else "cow",
        agg_view_every=args.agg_view_every,
    )
    out = {
        "mode": "replay-mor" if args.mor
        else "replay-dv" if args.dv else "replay",
        "epochs_applied": stats.epochs_applied,
        "epochs_skipped": stats.epochs_skipped,
        "events_applied": stats.events_applied,
        "seconds": round(stats.seconds, 3),
        "events_per_sec": round(stats.events_per_sec, 1),
        "table_version": table.version,
        "final_rows": table.read().count(),
        **({"manifests_exported": stats.manifests_exported}
           if args.export_manifest else {}),
    }
    # steady state = excluding the first epoch (JVM/codegen warmup
    # dominates it regardless of cluster size) — same definition as
    # bench.py's in-process runs, so the numbers compare directly
    if len(stats.per_epoch) >= 2:
        warm = stats.per_epoch[1:]
        warm_events = sum(m.n_source for m in warm if not m.skipped)
        warm_secs = stats.seconds - stats.per_epoch[0].seconds
        out["steady_seconds"] = round(warm_secs, 3)
        out["steady_events_per_sec"] = round(
            warm_events / warm_secs if warm_secs > 0 else 0.0, 1
        )
    if rollup is not None:
        out["rollup_rows"] = rollup.read().count()
    if dedup_index is not None:
        out["dedup_index_rows"] = dedup_index.read().count()
    if term_index is not None:
        out["term_index_rows"] = term_index.read().count()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
