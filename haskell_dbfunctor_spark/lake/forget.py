"""Right-to-be-forgotten erasure across a state table and its
derived tables (GDPR Art. 17 / CCPA deletion for a training-data
lake).

The production pattern (public Delta/Iceberg GDPR guidance) is
three-step: (1) logically DELETE the subject's rows, (2) propagate
the delete to every derived table that embeds the data, (3)
physically expire the historical snapshots + vacuum unreferenced
files so the bytes are actually gone. This module does all three
over the engine's lake:

- :func:`forget_keys` stages the state-table delete and the derived
  refreshes (per-group rollup, MinHash signature index, inverted term
  index) in ONE multi-table transaction (``cdc.apply._txn_epoch`` —
  the same path CDC replay uses), so a reader joining state to an
  index never observes the forget half-applied. The index deletes are
  derived from the committed CDF pre-images, not from the caller's
  read, so they are correct even if a concurrent writer raced the
  forget (the transaction re-validates and aborts on overlap).
- ``purge=True`` then makes the erasure PHYSICAL: fold pending MoR
  deltas (tombstones alone leave old base bytes live), expire every
  snapshot but the post-forget head, and remove the now-orphaned
  files. After a purge no file under any touched table root contains
  the forgotten rows — at the price of time travel, CDF history, and
  incremental-sync cursors older than the forget (documented trade;
  Delta's VACUUM has the same effect).

Contracts and caveats (read before wiring into production):

- The delete batch is built from the rows VISIBLE at call time. A
  change event for a forgotten key arriving AFTER the forget commits
  re-inserts the key (standard CDC MERGE semantics — a delete is not
  a tombstone). Quiesce or blocklist the keys upstream first.
- Row-lineage tables work (round 5): the transaction's staged chain
  claims a disjoint row-id reservation block at stage time, so fork
  sides can never double-allocate ids (see
  ``LakeTable._claim_row_id_block``). A forget is delete-only, so no
  new ids are minted anyway — the block claim is the general WAP
  contract, not a forget-specific cost.
- Rows quarantined by merge expectations live OUTSIDE snapshots
  (``quarantine()`` dirs) and are not touched here.
- Per-commit lineage/metrics records store only counts and file
  paths, never row content — they survive a purge by design.

Reference seam: the reference's only deletion surface is
``deleteRTab`` (in-memory, /root/reference/src/RTable/Core.hs); the
multi-table, snapshot-expiring shape is the north-rule lake recast.
"""

from __future__ import annotations

import hashlib
import json
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .table import LakeError, LakeTable
from .transaction import Catalog

__all__ = ["forget_keys", "drain_forget_dir"]


def forget_keys(
    catalog: Catalog,
    state: LakeTable,
    keys: DataFrame,
    *,
    rollup: LakeTable | None = None,
    rollup_group_cols: Sequence[str] = ("role",),
    dedup_index: LakeTable | None = None,
    dedup_index_mode: str = "cow",
    term_index: LakeTable | None = None,
    term_index_mode: str = "cow",
    order_cols: Sequence[str] = ("ts", "seq"),
    mode: str = "cow",
    purge: bool = False,
    purge_grace_seconds: int = 0,
) -> dict:
    """Atomically delete every state row matching ``keys`` and refresh
    the passed derived tables in the same transaction.

    ``keys``: a small DataFrame whose columns name any subset of the
    state schema (typically ``conv_id`` — a key prefix is NOT required;
    matching is by equality on the given columns). It is collected to
    the driver (forget requests are human-scale) both to broadcast the
    probe and to derive a deterministic epoch id, so a crashed forget
    re-run against the same head is idempotent.

    Returns ``{"matched", "epoch_id", "skipped", "stats", "versions",
    "purged"}``.
    """
    probe_cols = list(keys.columns)
    missing = [c for c in probe_cols if c not in state.schema.names]
    if missing:
        raise LakeError(
            f"forget_keys: probe columns {missing} not in the state "
            f"schema {state.schema.names}"
        )
    ah = catalog.read(state.root)
    fork = ah.version
    key_rows = sorted(
        tuple("\0" if v is None else str(v) for v in r)
        for r in keys.distinct().collect()
    )
    if not key_rows:
        return {"matched": 0, "skipped": True, "epoch_id": None,
                "stats": None, "versions": {}, "purged": {}}
    digest = hashlib.sha256(
        json.dumps(key_rows).encode()
    ).hexdigest()[:12]
    eid = f"forget-v{fork}-{digest}"

    probe = keys.distinct()
    # eager checkpoint: the batch feeds the state merge AND the dedup
    # index's raw-batch leg; freeze one consistent matched set
    batch = (
        ah.read()
        .join(F.broadcast(probe), probe_cols, "inner")
        .withColumn("op", F.lit("D"))
        .withColumn("seq", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    matched = batch.count()
    if matched == 0:
        return {"matched": 0, "skipped": True, "epoch_id": eid,
                "stats": None, "versions": {}, "purged": {}}

    from ..cdc.apply import _txn_epoch

    merge_opts = {
        "op_col": "op",
        "order_cols": tuple(order_cols),
        "mode": mode,
    }
    stats = _txn_epoch(
        ah, rollup, catalog, batch, eid, merge_opts,
        tuple(rollup_group_cols), fork,
        dedup_index=dedup_index, dedup_index_mode=dedup_index_mode,
        term_index=term_index, term_index_mode=term_index_mode,
    )
    state.manifest = state._load_latest_published_manifest()
    handles = {"state": state}
    if rollup is not None:
        handles["rollup"] = rollup
    if dedup_index is not None:
        handles["dedup_index"] = dedup_index
    if term_index is not None:
        handles["term_index"] = term_index
    out = {
        "matched": matched,
        "epoch_id": eid,
        "skipped": stats.skipped,
        "stats": stats,
        "versions": {n: h.version for n, h in handles.items()},
        "purged": {},
    }
    if purge and not stats.skipped:
        for name, h in handles.items():
            out["purged"][name] = _purge_table(h, purge_grace_seconds)
    return out


def drain_forget_dir(
    catalog: Catalog,
    state: LakeTable,
    forget_dir: str,
    *,
    rollup: LakeTable | None = None,
    rollup_group_cols: Sequence[str] = ("role",),
    dedup_index: LakeTable | None = None,
    dedup_index_mode: str = "cow",
    term_index: LakeTable | None = None,
    term_index_mode: str = "cow",
    order_cols: Sequence[str] = ("ts", "seq"),
    mode: str = "cow",
    purge: bool = False,
) -> list[dict]:
    """Drain a queue of right-to-be-forgotten requests (the production
    GDPR shape: compliance tooling drops request files, the ingest job
    honors them within one epoch).

    Each pending request is ``<name>.json`` in ``forget_dir``::

        {"rows": [{"conv_id": "c-17"}, {"conv_id": "c-40"}],
         "purge": false}

    Row dicts name any subset of the state schema (equality match,
    same contract as :func:`forget_keys`); ``purge`` optionally
    overrides the call-level default per request. Requests apply in
    filename order; each is renamed to ``<name>.json.applied`` (with
    the outcome embedded) only AFTER its transaction commits, so a
    crash between commit and rename re-runs the forget — harmless,
    because a re-run matches zero rows and skips. Malformed requests
    rename to ``.rejected`` instead of wedging the queue.

    Returns one outcome dict per request processed this call.
    """
    import os

    import pyspark.sql.types as T

    spark = state.spark
    out: list[dict] = []
    try:
        names = sorted(
            n for n in os.listdir(forget_dir) if n.endswith(".json")
        )
    except FileNotFoundError:
        return out
    for name in names:
        path = os.path.join(forget_dir, name)
        res: dict = {"request": name}
        try:
            with open(path) as fh:
                req = json.load(fh)
            rows = req.get("rows")
            if not isinstance(rows, list) or not rows or not all(
                isinstance(r, dict) and r for r in rows
            ):
                raise LakeError(
                    "forget request needs a non-empty 'rows' list of "
                    "non-empty {column: value} dicts"
                )
            cols = sorted({c for r in rows for c in r})
            schema = T.StructType([
                state.schema[c] for c in cols if c in state.schema.names
            ])
            if len(schema) != len(cols):
                bad = [c for c in cols if c not in state.schema.names]
                raise LakeError(
                    f"forget request columns {bad} not in the state "
                    f"schema {state.schema.names}"
                )
            probe = spark.createDataFrame(
                [tuple(r.get(c) for c in cols) for r in rows], schema
            )
            res.update(forget_keys(
                catalog, state, probe,
                rollup=rollup, rollup_group_cols=rollup_group_cols,
                dedup_index=dedup_index,
                dedup_index_mode=dedup_index_mode,
                term_index=term_index, term_index_mode=term_index_mode,
                order_cols=order_cols, mode=mode,
                purge=bool(req.get("purge", purge)),
            ))
            res.pop("stats", None)  # MergeStats is not JSON-serializable
            res["status"] = "applied"
            done = path + ".applied"
        except (LakeError, ValueError, KeyError, TypeError) as exc:
            res.update({"status": "rejected", "error": str(exc)})
            done = path + ".rejected"
        try:
            with open(done, "w") as fh:
                json.dump(res, fh, default=str)
            os.remove(path)
        except OSError:
            pass  # another drainer raced us; its outcome stands
        out.append(res)
    return out


def _purge_table(table: LakeTable, grace_seconds: int) -> dict:
    """Physically erase history: fold MoR deltas (a delete tombstone
    alone leaves the old base row's bytes in place), keep only the
    current snapshot, drop files no retained snapshot references.
    Idempotent; safe to re-run after a crash mid-purge."""
    rep: dict = {}
    if table.manifest.get("delta_files"):
        rep["compacted"] = bool(table.compact_deltas())
    exp = table.expire_snapshots(keep_last=1)
    rep["expired_versions"] = exp["expired_versions"]
    rep["expired_files"] = exp["removed_files"]
    orph = table.remove_orphans(grace_seconds=grace_seconds)
    rep["orphans_removed"] = orph["removed_files"]
    return rep
