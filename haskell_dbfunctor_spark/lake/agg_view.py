"""Incremental AGGREGATE-view maintenance off a change data feed.

The single-table half of incremental view maintenance (the join half
is ``lake/join_view.py``; ``lake/incremental.py`` is the stateless
DataFrame-level sum/count folder this module extends with a PERSISTED
cursor-driven view and the non-retractable min/max repair path): keep
a ``GROUP BY`` summary lake table
current from the source's CDF in O(changes + repaired groups) work per
refresh — never a full recompute. Recasts the reference's
whole-pipeline re-run model — a Julius chain re-derives every grouped
RTable from scratch per run (/root/reference/src/Etl/Julius.hs,
`runGroupBy` /root/reference/src/RTable/Core.hs:2661) — as
cursor-driven maintenance, the shape every 100 TB rollup needs: the
refresh cost is proportional to what changed, not to the table.

Aggregate algebra (the classic IVM split):

- **retractable** (``Count``/``Sum``): the preimage CDF
  (``changes_since(cursor, preimages=True)``) yields +1 rows for
  'I'/'U_post' and -1 rows for 'D'/'U_pre'; one hash aggregation folds
  them into per-group deltas, added to the stored value. ``Sum``
  maintains a visible companion ``<name>_n`` non-NULL count so an
  all-retracted sum goes back to SQL NULL, not 0 — the auxiliary count
  every algebraic IVM system stores.

  **Float contract** (the classic IVM caveat): incremental Sum is
  EXACT for integral/decimal columns — adding and subtracting long or
  decimal deltas commutes — but for DOUBLE/FLOAT measures, adding and
  later subtracting rounded deltas drifts relative to a from-scratch
  aggregate (``1e16 + 1 - 1e16`` folds to ``0`` incrementally, ``1``
  exactly). By default this module therefore treats a RETRACTION
  touching a floating-point Sum column like a min/max retraction: the
  group goes dirty and is re-aggregated exactly from the pinned
  snapshot, so stored float sums never accumulate cancellation drift
  across syncs. Insert-only folds stay incremental — their error is
  plain fp-summation reassociation, the same class as Spark's own
  nondeterministic partial-aggregation order, bounded by one rounding
  per sync (relative error ≤ syncs · ulp · condition-number, NOT
  cumulative cancellation). Workloads that delete/update float
  measures constantly can pass ``float_sum_repair=False`` to keep the
  O(changes)-only path and accept the drift — or declare the measure
  as decimal/long in the source schema, which is the real fix.
- **non-retractable** (``Min``/``Max``): inserts fold in place
  (``least``/``greatest``); a retraction that ties-or-beats the stored
  extreme makes the group **dirty**, and dirty groups are re-aggregated
  EXACTLY from the pinned source snapshot via a broadcast semi-join on
  the dirty keys — bounded by the number of touched groups, never a
  table scan of untouched groups. (Declare ``clustering.sort-by`` /
  bucket the source by a group column to turn the repair read into a
  pruned read; without it the repair is one scan of the source
  filtered map-side by the broadcast.)

Groups whose live row count reaches zero leave the view (op 'D').
NULL group values are first-class: the view is created with
``nullable_keys=True`` and every maintenance join is null-safe.

The cursor is the source version encoded in the view's own
applied-epoch set (``sync-vg-<V>``, sharing ``sync_table``'s
retention-exempt ``sync-v`` prefix); exactly-once falls out of the
sink's idempotent MERGE — same contract as ``lake/sync.py``.
Renames inside the window make ``changes_since`` refuse (rewrites
touch every row); drop the view's cursor and rebuild via a fresh
``create_agg_view`` + sync in that case.
"""

from __future__ import annotations

import re
from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from .table import SYNC_EPOCH_PREFIX, LakeError, LakeTable

# shares sync_table's prefix so _commit's epoch-retention pruning pins
# the newest entry (the cursor) — see table.py SYNC_EPOCH_PREFIX
AV_PREFIX = f"{SYNC_EPOCH_PREFIX}g-"
_AV_RE = re.compile(rf"^{re.escape(SYNC_EPOCH_PREFIX)}g-(\d+)$")

N_ROWS = "n_rows"


@dataclass(frozen=True)
class Sum:
    """SUM(col) AS name — retractable; maintains a visible companion
    ``<name>_n`` non-NULL count (NULL sum iff the count is 0)."""

    col: str
    name: str


@dataclass(frozen=True)
class Min:
    """MIN(col) AS name — inserts fold in place; retractions that
    tie-or-beat the stored min trigger exact group repair."""

    col: str
    name: str


@dataclass(frozen=True)
class Max:
    col: str
    name: str


AggSpec = Sum | Min | Max


def av_cursor(dst: LakeTable) -> int:
    """Source version the view has been synced through; 0 = never
    (the next sync is the initial full build)."""
    best = 0
    for e in dst.applied_epochs():
        m = _AV_RE.match(e)
        if m:
            best = max(best, int(m.group(1)))
    return best


def _check_specs(
    src: LakeTable, group_cols: Sequence[str], specs: Sequence[AggSpec]
) -> None:
    names = {f.name for f in src.schema.fields}
    out_names: set[str] = set(group_cols) | {N_ROWS}
    for g in group_cols:
        if g not in names:
            raise LakeError(f"agg_view: group column {g!r} not in source")
    for s in specs:
        if s.col not in names:
            raise LakeError(f"agg_view: {s.name}: column {s.col!r} not in source")
        new = [s.name, f"{s.name}_n"] if isinstance(s, Sum) else [s.name]
        for n in new:
            if n in out_names:
                raise LakeError(f"agg_view: output column {n!r} collides")
            out_names.add(n)


def _exact_aggs(specs: Sequence[AggSpec]) -> list:
    """Full-aggregation expressions (initial build + dirty repair)."""
    out = [F.count(F.lit(1)).cast("long").alias(N_ROWS)]
    for s in specs:
        if isinstance(s, Sum):
            out.append(F.sum(s.col).alias(s.name))
            out.append(F.count(s.col).cast("long").alias(f"{s.name}_n"))
        elif isinstance(s, Min):
            out.append(F.min(s.col).alias(s.name))
        else:
            out.append(F.max(s.col).alias(s.name))
    return out


def agg_view_schema(
    src: LakeTable, group_cols: Sequence[str], specs: Sequence[AggSpec]
) -> T.StructType:
    """Schema of the maintained view: the group columns, ``n_rows``,
    then one column per spec (+ the ``_n`` companions for sums), with
    the exact types Spark's own aggregation would produce."""
    _check_specs(src, group_cols, specs)
    empty = src.spark.createDataFrame([], src.schema)
    agged = empty.groupBy(*group_cols).agg(*_exact_aggs(specs))
    # group columns stay nullable in the view even when the source
    # column is not (the view is created nullable_keys=True)
    return T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in agged.schema.fields]
    )


def create_agg_view(
    spark: SparkSession,
    root: str,
    src: LakeTable,
    group_cols: Sequence[str],
    specs: Sequence[AggSpec],
    *,
    num_buckets: int = 32,
    **create_opts,
) -> LakeTable:
    """Create the (empty) view table, keyed by the group columns with
    null-safe key joins (group values may legitimately be NULL)."""
    create_opts.setdefault("nullable_keys", True)
    return LakeTable.create(
        spark,
        root,
        agg_view_schema(src, group_cols, specs),
        key_cols=list(group_cols),
        num_buckets=num_buckets,
        **create_opts,
    )


def open_or_create_agg_view(
    spark: SparkSession,
    root: str,
    src: LakeTable,
    group_cols: Sequence[str],
    specs: Sequence[AggSpec],
    **create_opts,
) -> LakeTable:
    """Load the view if it exists, else create it — the idempotent
    open every resumable ingest job needs (mirrors
    cdc/apply.py:open_or_create_rollup)."""
    try:
        return LakeTable.load(spark, root)
    except FileNotFoundError:
        return create_agg_view(
            spark, root, src, group_cols, specs, **create_opts
        )


def _null_safe_semi(
    left: DataFrame, keys: DataFrame, cols: Sequence[str], how: str,
    broadcast: bool = True,
) -> DataFrame:
    """left SEMI/ANTI join keys on null-safe group equality; the keys
    side broadcasts by default (touched groups are metadata-scale
    relative to the data for rollup-shaped views) — pass
    ``broadcast=False`` when the group key is high-cardinality (e.g.
    per-user views where an epoch touches millions of groups) and the
    planner should shuffle both sides instead."""
    k = keys.select(
        *[F.col(c).alias(f"__gk_{i}") for i, c in enumerate(cols)]
    )
    cond = None
    for i, c in enumerate(cols):
        e = left[c].eqNullSafe(k[f"__gk_{i}"])
        cond = e if cond is None else cond & e
    return left.join(F.broadcast(k) if broadcast else k, cond, how)


def sync_agg_view(
    src: LakeTable,
    dst: LakeTable,
    group_cols: Sequence[str],
    specs: Sequence[AggSpec],
    *,
    mode: str = "cow",
    broadcast_keys: bool = True,
    float_sum_repair: bool = True,
) -> dict:
    """Advance ``dst`` to ``SELECT group_cols, aggs FROM src@current
    GROUP BY group_cols``. The first sync is the full build; every
    later sync costs O(change rows) + an exact re-aggregation of the
    dirty groups only. Idempotent: re-running after a crash re-applies
    the same epoch and the sink's applied-epoch check skips it.

    ``broadcast_keys=False`` switches the touched-group state read and
    the dirty-group repair from broadcast semi-joins to shuffle joins
    — required when the group key is high-cardinality enough that an
    epoch's touched-group set outgrows the broadcast budget (per-user
    or per-conv views at web scale); rollup-shaped views (per-role,
    per-source, per-day) keep the default.

    ``float_sum_repair`` (default True): a retraction touching a
    DOUBLE/FLOAT ``Sum`` column marks its group dirty for exact
    re-aggregation, so cancellation drift (``1e16 + 1 - 1e16`` → 0)
    never accumulates in stored float sums — see the module docstring
    for the full float contract. ``False`` keeps the pure O(changes)
    algebra and accepts the drift."""
    _check_specs(src, group_cols, specs)
    float_sum = {
        s.name
        for s in specs
        if isinstance(s, Sum)
        and isinstance(src.schema[s.col].dataType, (T.DoubleType, T.FloatType))
    } if float_sum_repair else set()
    gcols = list(group_cols)
    cursor = av_cursor(dst)
    va = src.version
    if cursor > va:
        raise LakeError(
            f"sync_agg_view: cursor {cursor} is ahead of the source "
            f"version {va} (rollback or wrong tables?)"
        )
    if cursor == va:
        return {"synced_from": cursor, "synced_to": va, "skipped": True}
    pinned = LakeTable.load(src.spark, src.root, va)
    epoch = f"{AV_PREFIX}{va}"

    if cursor == 0:
        batch = (
            pinned.read()
            .groupBy(*gcols)
            .agg(*_exact_aggs(specs))
            .withColumn("op", F.lit("U"))
        )
        stats = dst.merge(batch, epoch_id=epoch, op_col="op", mode=mode)
        return {"synced_from": 0, "synced_to": va,
                "skipped": getattr(stats, "skipped", False),
                "initial_build": True, "stats": stats}

    # NET window diff, not per-commit granularity: a key inserted then
    # retracted inside the window contributes zero to every retractable
    # delta and never needs to exist for the min/max algebra (stale
    # intermediates only matter when their retraction fires the dirty
    # rule, and a net diff has neither side) — so one bucket-pruned
    # diff pays for the WHOLE window no matter how many commits it
    # spans. Syncing every K epochs therefore costs one diff, not K
    # (see cdc/apply.py replay(agg_view_every=...)).
    ch = src.changes(cursor, va, preimages=True)
    w = (
        F.when(F.col("_change_type").isin("I", "U_post"), F.lit(1))
        .otherwise(F.lit(-1))
        .alias("__w")
    )
    deltas_exprs = [F.sum("__w").cast("long").alias("__d_n")]
    for s in specs:
        if isinstance(s, Sum):
            deltas_exprs.append(
                F.sum(
                    F.when(
                        F.col(s.col).isNotNull(),
                        F.col("__w") * F.col(s.col),
                    )
                ).alias(f"__d_{s.name}")
            )
            deltas_exprs.append(
                F.sum(F.when(F.col(s.col).isNotNull(), F.col("__w")))
                .cast("long")
                .alias(f"__d_{s.name}_n")
            )
            if s.name in float_sum:
                # any non-NULL retraction on a float measure → dirty
                # (exact repair; see float contract in module docstring)
                deltas_exprs.append(
                    F.max(
                        F.when(
                            (F.col("__w") == -1) & F.col(s.col).isNotNull(),
                            F.lit(True),
                        )
                    ).alias(f"__ret_{s.name}")
                )
        elif isinstance(s, Min):
            deltas_exprs.append(
                F.min(F.when(F.col("__w") == 1, F.col(s.col)))
                .alias(f"__ins_{s.name}")
            )
            deltas_exprs.append(
                F.min(F.when(F.col("__w") == -1, F.col(s.col)))
                .alias(f"__rem_{s.name}")
            )
        else:
            deltas_exprs.append(
                F.max(F.when(F.col("__w") == 1, F.col(s.col)))
                .alias(f"__ins_{s.name}")
            )
            deltas_exprs.append(
                F.max(F.when(F.col("__w") == -1, F.col(s.col)))
                .alias(f"__rem_{s.name}")
            )
    needed = list(dict.fromkeys([*gcols, *[s.col for s in specs]]))
    delta = ch.select(*needed, w).groupBy(*gcols).agg(*deltas_exprs)

    # touched-group state: the view IS keyed by the group columns, so
    # this read could bucket-prune; the broadcast semi keeps it one
    # filtered scan either way (touched groups ≪ view rows)
    state = _null_safe_semi(
        dst.read(), delta.select(*gcols), gcols, "leftsemi",
        broadcast=broadcast_keys,
    ).select(
        *[F.col(c).alias(f"__o_{c}" if c not in gcols else c)
          for c in dst.schema.names]
    )
    cond = None
    for c in gcols:
        e = delta[c].eqNullSafe(state[c])
        cond = e if cond is None else cond & e
    j = delta.join(state, cond, "left")
    j = j.select(
        *[delta[c] for c in delta.columns],
        *[state[c] for c in state.columns if c.startswith("__o_")],
    )
    # one materialization of the O(touched groups) joined frame; the
    # incremental images, the dirty-key set, and the anti-join below
    # all reuse it without recomputing the CDF subtree
    j = j.localCheckpoint(eager=True)

    new_n = (F.coalesce(F.col(f"__o_{N_ROWS}"), F.lit(0)) + F.col("__d_n"))
    img = [F.col(c) for c in gcols] + [new_n.cast("long").alias(N_ROWS)]
    dirty = F.lit(False)
    for s in specs:
        if isinstance(s, Sum):
            nn = (
                F.coalesce(F.col(f"__o_{s.name}_n"), F.lit(0))
                + F.coalesce(F.col(f"__d_{s.name}_n"), F.lit(0))
            )
            val = F.when(
                nn > 0,
                F.coalesce(F.col(f"__o_{s.name}"), F.lit(0))
                + F.coalesce(F.col(f"__d_{s.name}"), F.lit(0)),
            )
            img.append(val.cast(dst.schema[s.name].dataType).alias(s.name))
            img.append(nn.cast("long").alias(f"{s.name}_n"))
            if s.name in float_sum:
                dirty = dirty | F.coalesce(
                    F.col(f"__ret_{s.name}"), F.lit(False)
                )
        else:
            old = F.col(f"__o_{s.name}")
            ins = F.col(f"__ins_{s.name}")
            rem = F.col(f"__rem_{s.name}")
            fold = F.least(old, ins) if isinstance(s, Min) else F.greatest(old, ins)
            img.append(fold.alias(s.name))
            # a retraction that ties-or-beats the stored extreme may
            # have removed the extreme itself — the group needs exact
            # repair. A retraction against a group with NO stored
            # extreme (all-NULL or feed/state drift) also repairs.
            beat = (rem <= old) if isinstance(s, Min) else (rem >= old)
            dirty = dirty | (rem.isNotNull() & (old.isNull() | beat))
    incr = j.select(*img, dirty.alias("__dirty"))

    dirty_keys = incr.where(F.col("__dirty") & (F.col(N_ROWS) > 0)).select(
        *gcols
    )
    # cheap: a narrow count over the already-checkpointed frame,
    # bounded by touched groups — surfaced so operators can watch the
    # repair rate (a high rate means the workload deletes extremes
    # constantly and the view should store top-k reserves instead)
    n_dirty = dirty_keys.count()
    clean = _null_safe_semi(
        incr.drop("__dirty"), dirty_keys, gcols, "left_anti",
        broadcast=broadcast_keys,
    )
    repair = (
        _null_safe_semi(pinned.read(), dirty_keys, gcols, "leftsemi",
                        broadcast=broadcast_keys)
        .groupBy(*gcols)
        .agg(*_exact_aggs(specs))
    )
    batch = (
        clean.unionByName(repair.select(*clean.columns))
        .withColumn(
            "op", F.when(F.col(N_ROWS) <= 0, F.lit("D")).otherwise(F.lit("U"))
        )
    )
    # cast every column to the view schema (incremental arithmetic can
    # widen differently than Spark's own aggregation)
    batch = batch.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name)
          for f in dst.schema.fields],
        "op",
    )
    stats = dst.merge(batch, epoch_id=epoch, op_col="op", mode=mode)
    return {
        "synced_from": cursor,
        "synced_to": va,
        "skipped": getattr(stats, "skipped", False),
        "dirty_groups": n_dirty,
        "stats": stats,
    }
