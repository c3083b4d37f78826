"""Incremental JOIN-view maintenance off two change data feeds.

The two-table half of incremental view maintenance: keep a
denormalized ``fact JOIN dim`` lake table current from BOTH sources'
CDFs in O(changes) work per refresh — never a full recompute. This is
the classic delta-join rule (dM = dA⋈B ∪ A'⋈dB) specialized to the
star-join shape every training-data pipeline has (transcripts ⋈
conversation metadata, orders ⋈ customer): the view is keyed by the
FACT key, each fact row joins at most one dim row, and the dim key is
immutable (it is the dim table's primary key).

Recasts the reference's whole-pipeline re-run model — a Julius chain
re-derives every intermediate RTable from scratch on each run
(/root/reference/src/Etl/Julius.hs) — as cursor-driven maintenance:

- **fact leg**: ``fact.changes_since(ca)`` (bucket-pruned, O(changed
  fact rows)) joined against the CURRENT dim snapshot; deletes
  propagate as deletes.
- **dim leg**: the distinct dim keys in ``dim.changes_since(cb)``
  select the affected fact rows (stats-pruned ``read_where`` + an IN
  filter when the key set is small, a broadcast semi-join otherwise),
  which are re-joined against the current dim snapshot. At 100 TB
  this is the leg that decides scale: declare
  ``clustering.sort-by=<fk>`` on the fact table so the affected-row
  read prunes files instead of scanning the fact table.

Both legs join against the SAME pinned dim snapshot, so a key touched
by both produces identical images and last-writer-wins is safe. The
dual cursor (synced-through fact version, dim version) is encoded in
the view's own applied-epoch set (``sync-vj-a<VA>-b<VB>``, sharing
sync_table's retention-exempt ``sync-v`` prefix) — exactly-once falls
out of the sink's idempotent MERGE, the same contract as
``lake/sync.py``.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from .table import SYNC_EPOCH_PREFIX, LakeError, LakeTable

# shares sync_table's prefix so _commit's epoch-retention pruning pins
# the newest entry (the cursor) — see table.py SYNC_EPOCH_PREFIX
JV_PREFIX = f"{SYNC_EPOCH_PREFIX}j-a"
_JV_RE = re.compile(rf"^{re.escape(SYNC_EPOCH_PREFIX)}j-a(\d+)-b(\d+)$")


def jv_cursors(dst: LakeTable) -> tuple[int, int]:
    """(fact version, dim version) the view has been synced through;
    (0, 0) = never (the next sync is the initial full build)."""
    best = (0, 0)
    for e in dst.applied_epochs():
        m = _JV_RE.match(e)
        if m:
            best = max(best, (int(m.group(1)), int(m.group(2))))
    return best


def _dim_payload(dim: LakeTable, dim_prefix: str) -> list[tuple[str, str]]:
    """[(dim column, view column)] for the dim's non-key payload."""
    return [
        (f.name, f"{dim_prefix}{f.name}")
        for f in dim.schema.fields
        if f.name not in dim.key_cols
    ]


def join_view_schema(
    fact: LakeTable,
    dim: LakeTable,
    *,
    dim_prefix: str = "",
) -> T.StructType:
    """Schema of the maintained view: every fact column, then the
    dim's non-key payload (optionally prefixed). Collisions raise —
    silently shadowing a fact column with a dim column would corrupt
    the view on the first refresh."""
    fields = list(fact.schema.fields)
    names = {f.name for f in fields}
    for src, out in _dim_payload(dim, dim_prefix):
        if out in names:
            raise LakeError(
                f"join_view_schema: dim column {src!r} maps to {out!r} "
                "which collides with a fact column — pass dim_prefix"
            )
        f = dim.schema[src]
        fields.append(T.StructField(out, f.dataType, True))
    return T.StructType(fields)


def create_join_view(
    spark: SparkSession,
    root: str,
    fact: LakeTable,
    dim: LakeTable,
    *,
    dim_prefix: str = "",
    num_buckets: int | None = None,
    **create_opts,
) -> LakeTable:
    """Create the (empty) view table: keyed by the FACT key — each
    fact row contributes at most one view row, so fact-key merges are
    the natural maintenance unit — with the fact's bucket count by
    default (co-bucketed fact-leg merges prune identically)."""
    return LakeTable.create(
        spark,
        root,
        join_view_schema(fact, dim, dim_prefix=dim_prefix),
        key_cols=fact.key_cols,
        num_buckets=num_buckets or fact.num_buckets,
        **create_opts,
    )


def _joined(
    rows: DataFrame,
    dim_snap: DataFrame,
    fk_cols: Sequence[str],
    dim_keys: Sequence[str],
    payload: list[tuple[str, str]],
    how: str,
    op_expr,
) -> DataFrame:
    """LEFT-join ``rows`` (fact images + an ``op`` derivation) with the
    dim snapshot and emit the view image + op. ``how='inner'`` turns
    unmatched non-delete rows into deletes (the row leaves the view).
    Presence is detected with a literal marker column, never key
    NULL-ness (the engine-wide NULL-key rule)."""
    d = dim_snap.select(
        *[F.col(k).alias(f"__dk_{i}") for i, k in enumerate(dim_keys)],
        *[F.col(src).alias(out) for src, out in payload],
        F.lit(True).alias("__dim_present"),
    )
    cond = None
    for i, fk in enumerate(fk_cols):
        c = rows[fk] == d[f"__dk_{i}"]
        cond = c if cond is None else cond & c
    j = rows.join(d, cond, "left")
    op = F.when(op_expr == "D", F.lit("D"))
    if how == "inner":
        op = op.when(F.col("__dim_present").isNull(), F.lit("D"))
    op = op.otherwise(F.lit("U"))
    # unmatched rows already carry NULL dim payload from the left join
    return j.select(
        *[rows[c] for c in rows.columns if c != "op"],
        *[F.col(out) for _, out in payload],
        op.alias("op"),
    )


def sync_join_view(
    fact: LakeTable,
    dim: LakeTable,
    dst: LakeTable,
    *,
    fk_cols: Sequence[str],
    how: str = "left",
    dim_prefix: str = "",
    mode: str = "cow",
    max_collect_keys: int = 10_000,
) -> dict:
    """Advance ``dst`` to ``fact@current ⋈ dim@current``.

    ``fk_cols`` are the fact columns that equi-join the dim's key
    columns (positional). ``how`` is ``'left'`` (unmatched fact rows
    keep NULL dim payload — the denormalization norm) or ``'inner'``
    (unmatched fact rows leave the view). The first sync is the full
    build; every later sync is O(changes on either side).

    ``max_collect_keys`` bounds the driver-side IN-list for the
    dim-leg affected-row read; a larger changed-key set falls back to
    a broadcast join against the fact scan (documented O(fact-scan)
    worst case — cluster the fact table by the FK to keep the
    pruned-read path).
    """
    if how not in ("left", "inner"):
        raise LakeError(f"sync_join_view: how={how!r} (left|inner)")
    if len(fk_cols) != len(dim.key_cols):
        raise LakeError(
            f"sync_join_view: fk_cols {list(fk_cols)} must match the "
            f"dim key {list(dim.key_cols)} positionally"
        )
    join_view_schema(fact, dim, dim_prefix=dim_prefix)  # collision check
    payload = _dim_payload(dim, dim_prefix)
    ca, cb = jv_cursors(dst)
    va, vb = fact.version, dim.version
    if (ca, cb) > (va, vb):
        raise LakeError(
            f"sync_join_view: cursor ({ca},{cb}) is ahead of the "
            f"sources ({va},{vb}) (rollback or wrong tables?)"
        )
    if (ca, cb) == (va, vb):
        return {"synced_from": (ca, cb), "synced_to": (va, vb),
                "skipped": True}
    dim_snap = dim.read()
    legs: list[DataFrame] = []

    if ca == 0 and cb == 0:
        # initial build: one full join, still ONE idempotent merge
        base = fact.read().withColumn("op", F.lit("U"))
        legs.append(
            _joined(base, dim_snap, fk_cols, dim.key_cols, payload, how,
                    F.col("op"))
            .withColumn("_commit_version", F.lit(va).cast("int"))
        )
    else:
        if va > ca:
            fa = fact.changes_since(ca)
            rows = fa.select(
                *[c for c in fact.schema.names], "_change_type",
                "_commit_version",
            ).withColumn("op", F.col("_change_type")).drop("_change_type")
            legs.append(
                _joined(rows, dim_snap, fk_cols, dim.key_cols, payload,
                        how, F.col("op"))
            )
        if vb > cb:
            keys = (
                dim.changes_since(cb)
                .select(*dim.key_cols)
                .distinct()
            )
            n_keys = keys.count()  # metadata-scale: changed dim keys
            if n_keys:
                if len(fk_cols) == 1 and n_keys <= max_collect_keys:
                    vals = [r[0] for r in keys.collect()]
                    fk = fk_cols[0]
                    aff = fact.read_where(
                        fk, min(vals), max(vals)
                    ).where(F.col(fk).isin(vals))
                else:
                    sel = keys.select(
                        *[
                            F.col(k).alias(f"__k_{i}")
                            for i, k in enumerate(dim.key_cols)
                        ]
                    )
                    aff = fact.read()
                    cond = None
                    for i, fk in enumerate(fk_cols):
                        c = aff[fk] == sel[f"__k_{i}"]
                        cond = c if cond is None else cond & c
                    aff = aff.join(F.broadcast(sel), cond, "leftsemi")
                rows = aff.withColumn("op", F.lit("U")).withColumn(
                    "_commit_version", F.lit(va).cast("int")
                )
                legs.append(
                    _joined(rows, dim_snap, fk_cols, dim.key_cols,
                            payload, how, F.col("op"))
                )

    epoch = f"{JV_PREFIX}{va}-b{vb}"
    if not legs:
        # only the dim advanced, with zero net key changes — still
        # advance the cursor so the next sync doesn't re-walk the
        # empty range (an empty merge batch commits the epoch)
        batch = dst.spark.createDataFrame([], join_view_schema(
            fact, dim, dim_prefix=dim_prefix
        )).withColumn("op", F.lit("U")).withColumn(
            "_commit_version", F.lit(va).cast("int")
        )
    else:
        batch = legs[0]
        for l in legs[1:]:
            batch = batch.unionByName(l)
        # a key touched by both legs carries IDENTICAL images (both
        # joined against dim@vb) except for delete ordering, which
        # _commit_version resolves — merge LWW handles the rest
    stats = dst.merge(
        batch,
        epoch_id=epoch,
        op_col="op",
        order_cols=("_commit_version",),
        drop_cols=("_commit_version",),
        mode=mode,
    )
    return {
        "synced_from": (ca, cb),
        "synced_to": (va, vb),
        "skipped": getattr(stats, "skipped", False),
        "stats": stats,
    }
