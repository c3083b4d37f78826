#!/usr/bin/env python
"""spark-submit entry point for lake table maintenance.

The operational companion to jobs/cdc_ingest.py — a long-running ingest
needs periodic layout upkeep, run as its own (idempotent, snapshot-
committed) jobs:

    spark-submit --py-files /tmp/hdbf.zip jobs/lake_maintenance.py \
        --table-root /data/lake/transcripts compact --min-files 2
    ... expire --keep-last 2
    ... rebucket --num-buckets 8192

Each action prints ONE JSON line with what it did. All three are pure
layout/metadata changes: final table state is untouched (compact,
expire) or identical under the new layout (rebucket).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description="Lake table maintenance")
    ap.add_argument("--table-root", default=None,
                    help="required for table actions; txn-* actions "
                         "use --catalog-root instead")
    sub = ap.add_subparsers(dest="action", required=True)

    tr = sub.add_parser(
        "txn-recover",
        help="resolve pending multi-table transactions: roll committed "
             "ones forward, steal-abort undecided ones",
    )
    tr.add_argument("--catalog-root", required=True)
    tx = sub.add_parser(
        "txn-expire",
        help="truncate the resolved prefix of the transaction intent "
             "log (committed work stays durable in table manifests)",
    )
    tx.add_argument("--catalog-root", required=True)
    tx.add_argument("--keep-last", type=int, default=16)

    c = sub.add_parser("compact", help="coalesce small/fragmented bucket files")
    c.add_argument("--target-file-mb", type=int, default=128)
    c.add_argument("--min-files", type=int, default=2)
    c.add_argument("--max-buckets", type=int, default=None,
                   help="budget-limited maintenance: rewrite at most "
                        "this many buckets per run, worst-fragmented "
                        "first (converges over repeated runs; a full "
                        "OPTIMIZE at 100 TB is a table rewrite)")
    c.add_argument("--sort-by", default=None,
                   help="cluster the rewrite on this column (range-split "
                        "sibling files + sorted rows; pair with analyze "
                        "for read_where file skipping)")
    c.add_argument("--zorder-by", default=None,
                   help="comma-separated columns: cluster on a Z-order "
                        "curve so range reads prune files on ANY of "
                        "them (Delta OPTIMIZE ZORDER BY analog)")
    c.add_argument("--where", nargs=3, metavar=("COL", "LO", "HI"),
                   default=None,
                   help="range-scope the pass (OPTIMIZE ... WHERE): "
                        "only buckets whose stats intersect [LO, HI] "
                        "on COL are considered — nightly maintenance "
                        "pays O(hot range), not O(table); pass 'none' "
                        "for an open bound")

    e = sub.add_parser("expire", help="drop old snapshots + orphaned files")
    e.add_argument("--keep-last", type=int, default=2)
    e.add_argument("--prune-lineage", action="store_true",
                   help="also drop expired versions' lineage/metrics "
                        "records (bounds the audit log)")
    e.add_argument("--older-than", type=float, default=None,
                   help="unix ts: RETAIN every snapshot committed "
                        "after this instant regardless of count "
                        "(time-based retention; combines with "
                        "--keep-last)")
    e.add_argument("--dry-run", action="store_true",
                   help="report what would expire without deleting")

    mt = sub.add_parser(
        "maintain",
        help="one-shot nightly cycle: budgeted compact -> expire "
             "-> orphan sweep",
    )
    mt.add_argument("--max-buckets", type=int, default=32)
    mt.add_argument("--target-file-mb", type=int, default=128)
    mt.add_argument("--keep-last", type=int, default=2)
    mt.add_argument("--retain-seconds", type=float, default=None,
                    help="time-based retention: keep every snapshot "
                         "younger than now - N seconds regardless of "
                         "count (expire's older_than)")
    mt.add_argument("--prune-lineage", action="store_true")
    mt.add_argument("--grace-seconds", type=int, default=3600)

    cd = sub.add_parser("compact-deltas",
                        help="fold pending merge-on-read delta files into "
                             "the base")

    cl = sub.add_parser(
        "clone",
        help="zero-copy (or --deep) CLONE of the current snapshot to a "
             "new root; shallow clones reference source files by "
             "absolute path (do not expire the source while they live)",
    )
    cl.add_argument("--dest-root", required=True)
    cl.add_argument("--deep", action="store_true")

    r = sub.add_parser("rebucket", help="rescale the hash-bucket layout")
    r.add_argument("--num-buckets", type=int, required=True)
    r.add_argument(
        "--lazy", action="store_true",
        help="metadata-only spec evolution: old buckets migrate "
             "progressively (merges fold what they touch; "
             "migrate-legacy folds the rest on a budget)",
    )

    ml = sub.add_parser(
        "migrate-legacy",
        help="fold pending lazy-rebucket legacy buckets into the "
             "current spec (state-preserving; budget with --max-buckets)",
    )
    ml.add_argument("--max-buckets", type=int, default=None)

    an = sub.add_parser(
        "analyze",
        help="collect per-file min/max column stats into the manifest "
             "(metadata-only commit; enables read_where file skipping)",
    )
    an.add_argument("--cols", required=True,
                    help="comma-separated column names")

    ab = sub.add_parser(
        "analyze-bloom",
        help="build per-file Bloom filters (point-lookup file skipping "
             "for partial-key / payload columns; one distributed pass)",
    )
    ab.add_argument("--cols", required=True,
                    help="comma-separated column names")
    ab.add_argument("--bits", type=int, default=8192)
    ab.add_argument("--k", type=int, default=4)

    anv = sub.add_parser(
        "analyze-ndv",
        help="build per-file HLL NDV sketches (Puffin analog; "
             "mergeable approximate distinct counts, O(new files) "
             "incremental); 'ndv' reports the live-union estimates",
    )
    anv.add_argument("--cols", required=True,
                     help="comma-separated column names")
    anv.add_argument("--lg-k", type=int, default=12)

    nv = sub.add_parser(
        "ndv",
        help="approximate distinct counts from stored sketches "
             "(live-file union, no data scan) + coverage",
    )
    nv.add_argument("--cols", default=None,
                    help="comma-separated column names (default: all "
                         "sketched)")

    sub.add_parser(
        "describe",
        help="DESCRIBE DETAIL: one JSON dict of schema, layout, "
             "constraints/properties, evolution state (defaults, "
             "dropped/renamed), row lineage, and the live file census",
    )

    ex = sub.add_parser(
        "export",
        help="symlink-format manifest export (Delta GENERATE analog): "
             "write the live-file listing + schema sidecar so external "
             "engines read the snapshot as plain parquet; refuses "
             "while deltas/DVs/unmaterialized defaults would diverge",
    )
    ex.add_argument("--dest", default=None,
                    help="output dir (default <root>/_symlink_format_manifest)")

    fs = sub.add_parser(
        "fsck",
        help="report-only integrity check: referenced files exist, "
             "bucket ids in range, epoch log / lineage HWM consistent; "
             "--deep adds full-scan invariants (row placement, key "
             "uniqueness, row-id uniqueness). Exit 3 on errors.",
    )
    fs.add_argument("--deep", action="store_true")

    sp = sub.add_parser(
        "set-props",
        help="ALTER TABLE SET/UNSET TBLPROPERTIES (metadata-only "
             "commit): k=v pairs to set; a bare key unsets it",
    )
    sp.add_argument("props", nargs="+",
                    help="k=v to set, bare k to unset")

    tg = sub.add_parser(
        "tag",
        help="name the current (or given) snapshot — an immutable ref "
             "pinned through expire; read back with load(tag=...)",
    )
    tg.add_argument("--name", required=True)
    tg.add_argument("--version", type=int, default=None)
    dtg = sub.add_parser("delete-tag", help="remove a tag ref")
    dtg.add_argument("--name", required=True)

    br = sub.add_parser(
        "branch",
        help="create a mutable branch ref at the current (or given) "
             "snapshot; write to it with merge_to_branch, publish "
             "with fast-forward",
    )
    br.add_argument("--name", required=True)
    br.add_argument("--version", type=int, default=None)
    dbr = sub.add_parser("delete-branch", help="remove a branch ref")
    dbr.add_argument("--name", required=True)
    ff = sub.add_parser(
        "fast-forward",
        help="publish a branch's staged chain onto main (metadata-only)",
    )
    ff.add_argument("--name", required=True)

    rb = sub.add_parser(
        "rollback",
        help="roll the table back to an earlier snapshot (new commit, "
             "files by reference; later epochs re-open for replay)",
    )
    rb.add_argument("--to-version", type=int, required=True)

    dc = sub.add_parser(
        "drop-column",
        help="metadata-only DROP COLUMN (no rewrites; the name is "
             "tombstoned against re-adding)",
    )
    dc.add_argument("--name", required=True)

    pb = sub.add_parser(
        "publish",
        help="publish a staged (write-audit-publish) snapshot chain",
    )
    pb.add_argument("--version", type=int, default=None,
                    help="staged chain head (default: newest staged)")

    ro = sub.add_parser(
        "remove-orphans",
        help="delete data files referenced by no manifest (crashed "
             "write attempts), older than the grace window",
    )
    ro.add_argument("--grace-seconds", type=int, default=3600)
    ro.add_argument("--dry-run", action="store_true",
                    help="report what would be removed (counts + "
                         "candidate list) without deleting anything")

    ch = sub.add_parser(
        "changes",
        help="write the change data feed between two snapshots "
             "(per-key I/U/D diff, bucket-pruned) as parquet",
    )
    ch.add_argument("--from-version", type=int, required=True)
    ch.add_argument("--to-version", type=int, default=None)
    ch.add_argument("--preimages", action="store_true",
                    help="Delta-CDF row contract: updates emit "
                         "U_pre/U_post image pairs")
    ch.add_argument("--out", required=True, help="output parquet dir")

    fd = sub.add_parser(
        "forget-drain",
        help="drain a right-to-be-forgotten request queue "
             "(lake/forget.py): each JSON request file deletes its "
             "data subjects from the state table and the given "
             "derived tables in one multi-table transaction — the "
             "sidecar-process form of cdc_ingest --forget-dir, safe "
             "to run beside a live stream tailer",
    )
    fd.add_argument("--forget-dir", required=True,
                    help="queue directory of <name>.json request files")
    fd.add_argument("--catalog-root", dest="fd_catalog_root",
                    required=True)
    fd.add_argument("--rollup-root", default=None)
    fd.add_argument("--rollup-by", default="role",
                    help="comma-separated rollup group columns")
    fd.add_argument("--dedup-index-root", default=None)
    fd.add_argument("--term-index-root", default=None)
    fd.add_argument("--mode", choices=("cow", "mor"), default="cow",
                    help="merge mode for the forget deletes")
    fd.add_argument("--purge", action="store_true",
                    help="default physical purge (snapshot expiry + "
                         "orphan sweep) for requests that don't set "
                         "their own 'purge' field")

    sav = sub.add_parser(
        "sync-agg-view",
        help="advance a persisted incremental aggregate view "
             "(lake/agg_view.py) to the source table's current "
             "snapshot: one net-window CDF diff + dirty-group repair; "
             "creates the view on first run",
    )
    sav.add_argument("--view-root", required=True)
    sav.add_argument("--by", required=True,
                     help="comma-separated group columns")
    sav.add_argument("--spec", action="append", default=[],
                     metavar="KIND:COL:NAME",
                     help="aggregate spec, repeatable: sum:value:v_sum "
                          "min:ts:first_ts max:turn_idx:max_turn "
                          "(n_rows is always maintained)")
    sav.add_argument("--mode", choices=("cow", "mor"), default="cow")
    sav.add_argument("--no-broadcast-keys", action="store_true",
                     help="shuffle-join the touched/dirty key sets "
                          "instead of broadcasting (high-cardinality "
                          "group keys)")

    rq = sub.add_parser(
        "requantize-ivf",
        help="probe centroid drift of a persisted IVF index "
             "(--table-root = the index) against its frozen quantizer "
             "table; when drift exceeds the threshold, retrain the "
             "quantizer from the current vectors, reassign codes "
             "cell-incrementally (writes only moved vectors), and "
             "re-cluster the index",
    )
    rq.add_argument("--quantizer-root", required=True)
    rq.add_argument("--drift-threshold", type=float, default=0.02)
    rq.add_argument("--n-centroids", type=int, default=None,
                    help="retrain with this many cells (default: keep "
                         "the current count)")
    rq.add_argument("--probe-only", action="store_true",
                    help="report the drift metrics without acting")

    dw = sub.add_parser(
        "delete-where",
        help="DELETE FROM table WHERE <sql predicate> (retention/GDPR "
             "deletes; CoW rewrites only match-bearing files, "
             "--mode mor appends O(matches) tombstones)",
    )
    dw.add_argument("--predicate", required=True,
                    help="SQL boolean expression over table columns, "
                         "e.g. \"ts < timestamp'2026-01-01'\"")
    uw = sub.add_parser(
        "update-where",
        help="UPDATE table SET col=expr[,col=expr] WHERE <sql predicate> "
             "(backfills; assignments see the OLD row and cast to the "
             "declared type)",
    )
    uw.add_argument("--predicate", required=True)
    uw.add_argument("--set", required=True, dest="assignments",
                    action="append",
                    help="col=sql-expr, repeatable: --set "
                         "\"tool=upper(tool)\" --set \"text=trim(text)\"")
    for p in (dw, uw):
        p.add_argument("--mode", choices=("cow", "mor", "dv"),
                       default="cow",
                       help="cow: rewrite match-bearing files; mor: "
                            "append O(matches) tombstone/patch deltas; "
                            "dv: deletion vectors — position-delete "
                            "files, zero data rewrite (updates append "
                            "only the patched images)")
        p.add_argument("--epoch-id", default=None,
                       help="exactly-once id: a replayed epoch is a "
                            "no-op (zero-match epochs also record)")

    # on every state-changing subparser so the flag parses in the
    # natural trailing position (`... compact --no-verify`); a parent-
    # parser flag placed after the subcommand is rejected by argparse.
    # `changes` is read-only — no row-count invariant, no flag;
    # `analyze`/`analyze-bloom` are metadata-only, same; `rollback`
    # and `publish` change state BY DESIGN; `drop-column` preserves
    # rows (checked).
    for p in (c, e, cd, r, dc, mt):
        p.add_argument("--no-verify", action="store_true",
                       help="skip the before/after row-count check (two "
                            "full table scans — skip on very large tables)")
    args = ap.parse_args(argv)

    from haskell_dbfunctor_spark.lake.table import LakeTable
    from haskell_dbfunctor_spark.session import get_spark

    spark = get_spark(app_name=f"lake-maintenance-{args.action}")

    if args.action in ("txn-recover", "txn-expire"):
        from haskell_dbfunctor_spark.lake.transaction import Catalog

        cat = Catalog(spark, args.catalog_root)
        res = (
            cat.recover() if args.action == "txn-recover"
            else cat.expire(keep_last=args.keep_last)
        )
        print(json.dumps({"action": args.action, **res}))
        return 0

    if not args.table_root:
        ap.error(f"{args.action} requires --table-root")
    table = LakeTable.load(spark, args.table_root)

    if args.action == "forget-drain":
        from haskell_dbfunctor_spark.lake.forget import drain_forget_dir
        from haskell_dbfunctor_spark.lake.transaction import Catalog

        cat = Catalog(spark, args.fd_catalog_root)
        legs = {}
        if args.rollup_root:
            legs["rollup"] = LakeTable.load(spark, args.rollup_root)
            legs["rollup_group_cols"] = tuple(
                c.strip() for c in args.rollup_by.split(",") if c.strip()
            )
        if args.dedup_index_root:
            legs["dedup_index"] = LakeTable.load(
                spark, args.dedup_index_root
            )
        if args.term_index_root:
            legs["term_index"] = LakeTable.load(spark, args.term_index_root)
        results = drain_forget_dir(
            cat, table, args.forget_dir,
            mode=args.mode, purge=args.purge, **legs,
        )
        print(json.dumps({
            "action": "forget-drain",
            "requests": len(results),
            "applied": sum(1 for r in results if r["status"] == "applied"),
            "rejected": sum(
                1 for r in results if r["status"] == "rejected"
            ),
            "results": results,
        }, default=str))
        return 0

    if args.action == "describe":
        print(json.dumps({"action": "describe", **table.describe()}))
        return 0

    if args.action == "export":
        print(json.dumps(
            {"action": "export", **table.export_symlink_manifest(args.dest)}
        ))
        return 0

    if args.action == "fsck":
        from haskell_dbfunctor_spark.lake.fsck import fsck

        res = fsck(table, deep=args.deep)
        print(json.dumps({"action": "fsck", **res}))
        return 0 if res["ok"] else 3

    if args.action == "set-props":
        props = {}
        for item in args.props:
            if "=" in item:
                k, v = item.split("=", 1)
                props[k] = v
            else:
                props[item] = None
        res = table.set_properties(props)
        print(json.dumps({"action": "set-props", **res}))
        return 0

    if args.action == "sync-agg-view":
        from haskell_dbfunctor_spark.lake.agg_view import (
            Max, Min, Sum, open_or_create_agg_view, sync_agg_view,
        )

        kinds = {"sum": Sum, "min": Min, "max": Max}
        specs = []
        for item in args.spec:
            parts = item.split(":")
            if len(parts) != 3 or parts[0].lower() not in kinds:
                ap.error(f"--spec needs KIND:COL:NAME with KIND in "
                         f"sum|min|max, got {item!r}")
            specs.append(kinds[parts[0].lower()](parts[1], parts[2]))
        gcols = [c.strip() for c in args.by.split(",") if c.strip()]
        view = open_or_create_agg_view(
            spark, args.view_root, table, gcols, specs,
        )
        res = sync_agg_view(
            table, view, gcols, specs, mode=args.mode,
            broadcast_keys=not args.no_broadcast_keys,
        )
        res.pop("stats", None)
        print(json.dumps({
            "action": "sync-agg-view",
            "view_version": view.version,
            "view_rows": view.read().count(),
            **res,
        }))
        return 0

    if args.action == "requantize-ivf":
        from haskell_dbfunctor_spark.pipelines.ivf_index import (
            maintain_ivf_index, quantizer_drift,
        )

        qt = LakeTable.load(spark, args.quantizer_root)
        if args.probe_only:
            res = {
                "drift_probe": quantizer_drift(table, qt),
                "triggered": False,
            }
        else:
            res = maintain_ivf_index(
                table, qt,
                drift_threshold=args.drift_threshold,
                n_centroids=args.n_centroids,
            )
            res.pop("cluster", None)  # MergeStats: not JSON-friendly
        print(json.dumps({
            "action": "requantize-ivf",
            "quantizer_version": qt.version,
            **res,
        }, default=str))
        return 0

    if args.action == "analyze":
        res = table.analyze([c.strip() for c in args.cols.split(",")])
        print(json.dumps({
            "action": "analyze",
            "table_version": table.version,
            **res,
        }))
        return 0

    if args.action == "analyze-bloom":
        res = table.analyze_bloom(
            [c.strip() for c in args.cols.split(",")],
            bits=args.bits, k=args.k,
        )
        print(json.dumps({
            "action": "analyze-bloom",
            "table_version": table.version,
            **res,
        }))
        return 0

    if args.action == "analyze-ndv":
        res = table.analyze_ndv(
            [c.strip() for c in args.cols.split(",")], lg_k=args.lg_k
        )
        print(json.dumps({
            "action": "analyze-ndv",
            "table_version": table.version,
            **res,
        }))
        return 0

    if args.action == "ndv":
        cols = (
            [c.strip() for c in args.cols.split(",")]
            if args.cols else None
        )
        print(json.dumps({
            "action": "ndv",
            "table_version": table.version,
            "ndv": table.ndv(cols),
        }))
        return 0

    if args.action == "branch":
        res = table.create_branch(args.name, version=args.version)
        print(json.dumps({"action": "branch", **res}))
        return 0

    if args.action == "delete-branch":
        table.delete_branch(args.name)
        print(json.dumps({"action": "delete-branch", "branch": args.name}))
        return 0

    if args.action == "fast-forward":
        res = table.fast_forward(args.name)
        print(json.dumps({"action": "fast-forward", "branch": args.name,
                          **res}))
        return 0

    if args.action == "tag":
        res = table.tag(args.name, version=args.version)
        print(json.dumps({"action": "tag", **res}))
        return 0

    if args.action == "delete-tag":
        table.delete_tag(args.name)
        print(json.dumps({"action": "delete-tag", "tag": args.name}))
        return 0

    if args.action == "rollback":
        res = table.rollback(args.to_version)
        print(json.dumps({
            "action": "rollback",
            "rows": table.read().count(),
            **res,
        }))
        return 0

    if args.action == "clone":
        c = table.shallow_clone(args.dest_root, deep=args.deep)
        print(json.dumps({
            "action": "clone",
            "dest_root": args.dest_root,
            "deep": bool(args.deep),
            "rows": c.read().count(),
            **c.manifest["cloned_from"],
        }))
        return 0

    if args.action == "remove-orphans":
        res = table.remove_orphans(
            grace_seconds=args.grace_seconds, dry_run=args.dry_run
        )
        print(json.dumps({"action": "remove-orphans", **res}))
        return 0

    if args.action == "publish":
        version = args.version
        if version is None:
            version = LakeTable._latest_version_on_disk(args.table_root)
        res = table.publish(version)
        print(json.dumps({"action": "publish", **res}))
        return 0

    if args.action == "changes":
        # read-only: no row-count invariant to verify
        ch_df = table.changes(
            args.from_version, args.to_version, preimages=args.preimages
        )
        ch_df.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
        print(json.dumps({
            "action": "changes",
            "from_version": args.from_version,
            "to_version": (table.version if args.to_version is None
                           else args.to_version),
            "out": args.out,
            "change_rows": n,
        }))
        return 0

    if args.action in ("delete-where", "update-where"):
        # row counts change BY DESIGN — no before/after invariant
        if args.action == "delete-where":
            st = table.delete_where(
                args.predicate, epoch_id=args.epoch_id, mode=args.mode
            )
        else:
            assigns = {}
            for pair in args.assignments:
                col, _, expr = pair.partition("=")
                if not _:
                    ap.error(f"--set pair missing '=': {pair!r}")
                assigns[col.strip()] = expr.strip()
            st = table.update_where(
                args.predicate, assigns,
                epoch_id=args.epoch_id, mode=args.mode,
            )
        print(json.dumps({
            "action": args.action,
            "table_version": table.version,
            "skipped": st.skipped,
            "n_deleted": st.n_deleted,
            "n_updated": st.n_updated,
            "buckets_touched": st.buckets_touched,
            **st.extra,
        }))
        return 0

    rows_before = None if args.no_verify else table.read().count()

    if args.action == "compact":

        def _bound(v: str):
            if v.lower() == "none":
                return None
            for cast in (int, float):
                try:
                    return cast(v)
                except ValueError:
                    continue
            return v  # string domain: buckets_where reads conservatively

        res = table.compact(
            target_file_bytes=args.target_file_mb * 1024 * 1024,
            min_files=args.min_files,
            max_buckets=args.max_buckets,
            sort_by=args.sort_by,
            zorder_by=(
                [c.strip() for c in args.zorder_by.split(",")]
                if args.zorder_by else None
            ),
            where=(
                (args.where[0], _bound(args.where[1]), _bound(args.where[2]))
                if args.where else None
            ),
        )
    elif args.action == "expire":
        res = table.expire_snapshots(
            keep_last=args.keep_last, prune_lineage=args.prune_lineage,
            older_than=args.older_than, dry_run=args.dry_run,
        )
    elif args.action == "maintain":
        res = table.maintain(
            max_buckets=args.max_buckets,
            target_file_bytes=args.target_file_mb * 1024 * 1024,
            keep_last=args.keep_last,
            older_than=(
                time.time() - args.retain_seconds
                if args.retain_seconds is not None
                else None
            ),
            prune_lineage=args.prune_lineage,
            grace_seconds=args.grace_seconds,
        )
    elif args.action == "compact-deltas":
        res = table.compact_deltas()
    elif args.action == "drop-column":
        res = table.drop_column(args.name)
    elif args.action == "migrate-legacy":
        res = table.migrate_legacy(max_buckets=args.max_buckets)
    else:
        res = table.rebucket(args.num_buckets, lazy=args.lazy)

    rows_after = None if args.no_verify else table.read().count()
    # explicit raise, not assert: asserts vanish under python -O and
    # this is the CLI's only correctness gate
    if rows_before is not None and rows_after != rows_before:
        raise RuntimeError(
            f"maintenance changed row count {rows_before} -> {rows_after}"
        )
    print(json.dumps({
        "action": args.action,
        "table_version": table.version,
        "rows": rows_after,
        **res,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
