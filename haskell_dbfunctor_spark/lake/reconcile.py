"""Full-snapshot reconcile — CDC ingest when the source can't give you
a change log.

Plenty of upstream systems can only hand over a periodic FULL dump
(nightly database export, a vendor's "here is everything" file drop).
``reconcile(table, snapshot)`` brings the lake table to exactly that
state with a MINIMAL change batch: new keys insert, changed rows
update, keys absent from the snapshot delete — the ``MERGE ... WHEN
NOT MATCHED BY SOURCE THEN DELETE`` mode of Delta/Iceberg SQL,
recast onto this lake's merge. Because the diff feeds the ordinary
:meth:`LakeTable.merge`, everything merge gives a change feed comes
for free: CDF records exactly the net row changes, expectations/
constraints gate the diff, WAP staging works (``stage_only=True``),
MoR appends only the delta, epoch idempotence makes a re-run of the
same dump a no-op, and bucket pruning skips every bucket the dump
didn't change — the common "dump is 99.9% identical" case rewrites
almost nothing.

Semantics (per snapshot column set):
- the snapshot is authoritative for the columns it CARRIES: a row
  differing on any carried column (null-safe, ``<=>``) updates;
- table columns the snapshot does not carry keep their current values
  (CoW ``update_cols`` semantics — a narrow dump can't clobber
  enrichment columns);
- a column new to the table evolves the schema, and only rows with a
  non-NULL value in it (or other drift) rewrite.

Scale: the diff is ONE full-outer key join — both sides shuffle once
on the key hash — plus the merge of its (usually tiny) output. Read
cost is inherently O(table + snapshot) (delete detection needs the
whole key set); WRITE cost is O(changed rows)/O(touched buckets).
Compare-at-scale note: the join carries the snapshot payload anyway
(to emit updates), so comparing structs in-join costs no extra
shuffle width vs a hash-first pass.

The reference's analog is wholesale re-creation of the target RTable
from the new source (Julius chains recompute every run,
/root/reference/src/Etl/Julius.hs); the reconcile keeps the
reference's "final table state equals the source" contract while
writing only the difference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .table import LakeError, LakeTable, MergeStats

_OP = "__rec_op"


def snapshot_diff(table: LakeTable, snapshot: DataFrame) -> DataFrame:
    """The minimal change batch turning ``table``'s current state into
    ``snapshot``: key cols + snapshot payload cols + ``__rec_op``
    ('U' upsert / 'D' delete). ``snapshot`` must be unique per key
    (it's a state, not a log — duplicates raise at merge time via
    ``on_duplicate='error'`` in :func:`reconcile`).
    """
    key = table.key_cols
    missing = [c for c in key if c not in snapshot.columns]
    if missing:
        raise LakeError(f"snapshot lacks key column(s) {missing}")
    nullable = bool(table.manifest.get("nullable_keys"))
    snap = snapshot
    if not nullable:
        # same policy as merge: NULL-keyed rows can't address a row
        for c in key:
            snap = snap.where(F.col(c).isNotNull())
    for c in key:  # normalize key types (xxhash64 is type-sensitive)
        if snap.schema[c].dataType != table.schema[c].dataType:
            snap = snap.withColumn(c, F.col(c).cast(table.schema[c].dataType))
    payload = [c for c in snap.columns if c not in key]

    cur = table.read()
    # target projected to the snapshot's column set; columns the table
    # doesn't have yet (schema evolution) read as NULL
    t_payload = [
        (F.col(c) if c in cur.columns
         else F.lit(None).cast(snap.schema[c].dataType)).alias(c)
        for c in payload
    ]
    t = cur.select(*key, *t_payload, F.lit(True).alias("__t_present")).alias("t")
    s = snap.select("*", F.lit(True).alias("__s_present")).alias("s")
    # null-safe key join only for nullable-key tables (mirrors merge:
    # <=> costs Catalyst the equi-join rewrite, don't pay it by default)
    cond = None
    for c in key:
        eq = (
            F.col(f"s.{c}").eqNullSafe(F.col(f"t.{c}"))
            if nullable
            else (F.col(f"s.{c}") == F.col(f"t.{c}"))
        )
        cond = eq if cond is None else (cond & eq)
    j = s.join(t, cond, "full_outer")
    s_here = F.coalesce(F.col("s.__s_present"), F.lit(False))
    t_here = F.coalesce(F.col("t.__t_present"), F.lit(False))
    if payload:
        same_row = F.struct(*[F.col(f"s.{c}") for c in payload]).eqNullSafe(
            F.struct(*[F.col(f"t.{c}") for c in payload])
        )
    else:  # key-only table: presence is the whole state
        same_row = F.lit(True)
    op = (
        F.when(~t_here, F.lit("U"))            # new key -> insert
        .when(~s_here, F.lit("D"))             # gone key -> delete
        .when(~same_row, F.lit("U"))           # drifted row -> update
    )  # identical row -> NULL -> filtered: not part of the batch
    out_key = [
        F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c) for c in key
    ]
    # deletes carry the TARGET payload (merge only needs the key for a
    # delete; carrying values keeps the batch schema uniform and lets
    # MoR's full-row check pass)
    out_payload = [
        F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c)
        for c in payload
    ]
    return (
        j.select(*out_key, *out_payload, op.alias(_OP))
        .where(F.col(_OP).isNotNull())
    )


def reconcile(
    table: LakeTable,
    snapshot: DataFrame,
    *,
    epoch_id: str | None = None,
    **merge_opts,
) -> MergeStats:
    """Make ``table`` equal ``snapshot`` (for the carried columns) by
    merging the minimal diff. Returns the merge stats — ``n_source``
    is the diff size, so a byte-identical dump reports 0 and commits
    nothing beyond the idempotence record.

    ``merge_opts`` pass through (``mode='mor'``, ``stage_only``,
    ``expectations``, ...). The diff is unique per key by
    construction, so the merge runs with ``on_duplicate='error'`` as a
    free sanity check unless the caller overrides it.
    """
    changes = snapshot_diff(table, snapshot)
    merge_opts.setdefault("on_duplicate", "error")
    return table.merge(
        changes,
        epoch_id=epoch_id,
        op_col=_OP,
        order_cols=(),
        delete_op="D",
        **merge_opts,
    )


def version_diff(
    table: LakeTable, from_version: int, to_version: int | None = None
) -> DataFrame:
    """STATE diff between two snapshots of ``table``: the minimal
    change batch (key + payload + ``__rec_op`` U/D) that turns
    ``from_version``'s state into ``to_version``'s (default: current).

    Complements ``changes_since`` (the CDF log): the log replays the
    COMMITS between two versions — per-epoch, with intermediate
    states — and is only available while those epochs' change files
    survive retention. The state diff compares the two snapshots
    themselves, so it works across compactions/expiry (any two
    loadable versions), collapses A→B→A churn to nothing, and is the
    right input for "rebuild a downstream copy that last saw v1".
    Cost: reads both snapshots + one full-outer key join (same shape
    as :func:`snapshot_diff`); the CDF path is O(changes) — prefer it
    when the epochs are still retained and you want per-commit grain.
    """
    old = LakeTable.load(table.spark, table.root, version=from_version)
    new = (
        table
        if to_version is None
        else LakeTable.load(table.spark, table.root, version=to_version)
    )
    # reuse snapshot_diff with "table state = old, snapshot = new":
    # U rows are inserts/updates landing between the versions, D rows
    # are keys deleted. new.read() carries the evolved schema, so
    # added columns appear with NULL for pre-evolution rows.
    return snapshot_diff(old, new.read())
