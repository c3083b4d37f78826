"""Predicate-level DML on a LakeTable: ``DELETE FROM ... WHERE`` and
``UPDATE ... SET ... WHERE`` (Iceberg row-level-operations analog).

The MERGE path (lake/table.py) mutates by KEY — the CDC shape. Real
lakes also need predicate mutations ("delete this source's documents",
"backfill a normalized column for March"), which the reference can only
express as a full-table rewrite (``deleteRTab``/``updateRTab`` rebuild
the whole in-memory RTable, /root/reference/src/RTable/Core.hs:1524-1600).
At 100 TB the whole point is to touch only the data that matches:

- **Copy-on-write (default).** One discovery scan finds the data files
  that contain matching rows — parquet predicate pushdown prunes
  row-groups physically, ``input_file_name()`` attributes the survivors
  — then ONLY those files are rewritten (surviving rows re-coalesced
  per bucket); every other file carries into the new snapshot by
  reference. This is exactly Iceberg's CoW DELETE granularity: file,
  not partition, not table. Buckets with pending merge-on-read deltas
  can't be rewritten file-wise (the latest image of a key is spread
  over base + deltas), so those buckets rewrite whole and fold their
  deltas — the same rule every CoW path in table.py follows.
- **``mode="mor"``** appends O(matching-rows) delta files instead:
  delete writes key tombstones, update writes patched full rows —
  both delegate to ``LakeTable.merge(mode="mor")``, inheriting its
  exactly-once epochs, CDF lineage, and read-side collapse.
- **``mode="dv"``** appends deletion vectors — position-delete files
  of (bucket, file basename, row index) triples, the Iceberg-v3 /
  Delta DV shape. DELETE writes no row payload at all; UPDATE vectors
  the old positions and appends only the patched images as fresh base
  files. Reads anti-join the vectors out of DV-bearing buckets only.
  The cheapest mutations when rows are wide (transcripts). See
  ``_dv_mutate``.

Semantics pinned to SQL: rows where the predicate is NULL are NOT
matched (DELETE keeps them, UPDATE leaves them); UPDATE assignments
evaluate against the OLD row (set a = b, b = a swaps); assignments cast
to the column's declared type (predicate DML never evolves the schema);
key columns cannot be assigned (that's an identity change — express it
as delete + insert through MERGE).

Exactly-once: pass ``epoch_id`` — a replay of an applied epoch is a
no-op, and a DML epoch that matched zero rows still commits a
metadata-only record so the replay doesn't pay the discovery scan
again. Concurrency follows merge: disjoint-bucket conflicts rebase
inside the commit; overlapping conflicts re-execute the whole operation
(discovery included) against the winner's snapshot, serializably.
"""

from __future__ import annotations

import datetime
import os
import re
import shutil
import time
import uuid
from typing import Mapping, Sequence
from urllib.parse import unquote, urlparse

from pyspark.sql import Column, DataFrame, functions as F

from .table import (
    BUCKET_COL,
    DATA_DIR,
    DV_SCHEMA,
    LAST_UPDATED_COL,
    ROW_ID_COL,
    CommitConflict,
    LakeError,
    LakeTable,
    MergeStats,
)


def _as_column(pred: Column | str) -> Column:
    return F.expr(pred) if isinstance(pred, str) else pred


def _match(pred: Column) -> Column:
    # SQL row-level ops match only TRUE: NULL predicate = not matched
    return F.coalesce(pred, F.lit(False))


def _rel_of(uri: str, root: str) -> str:
    """input_file_name() URI -> manifest-relative path."""
    p = urlparse(uri)
    path = unquote(p.path) if p.scheme else uri
    return os.path.relpath(path, os.path.abspath(root))


_LIT = r"(?:-?\d+(?:\.\d+)?|'[^']*'|(?:timestamp|date)\s*'[^']*')"
_CMP_RE = re.compile(
    rf"^\s*([A-Za-z_][A-Za-z0-9_]*)\s*(<=|>=|<|>|=)\s*({_LIT})\s*$"
)
_UNPRUNABLE_RE = re.compile(
    r"[()]|\bor\b|\bnot\b|\bin\b|\bbetween\b|\bis\b|\blike\b|\bcase\b",
    re.IGNORECASE,
)


def _parse_lit(lit: str):
    """SQL literal -> the manifest-stats ordering domain
    (LakeTable._stat_key): numbers as-is, strings raw, timestamp/date
    literals as epoch seconds (naive = UTC, matching the session TZ)."""
    m = re.match(r"^(timestamp|date)\s*'([^']*)'$", lit, re.IGNORECASE)
    if m:
        dt = datetime.datetime.fromisoformat(m.group(2))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=datetime.timezone.utc)
        return dt.timestamp()
    if lit.startswith("'"):
        return lit[1:-1]
    return float(lit) if "." in lit else int(lit)


def _conjunct_bounds(predicate: str) -> list[tuple[str, str, object]] | None:
    """Best-effort parse of a SQL predicate STRING into prunable
    ``col <op> literal`` conjuncts, for manifest-stats file skipping.
    Strictly conservative: any construct beyond a bare top-level AND of
    simple comparisons (parens, OR, NOT, IN, BETWEEN, IS, LIKE,
    functions) returns None — no pruning, never a wrong skip. The
    retention shape (``ts < timestamp'...'``) is the case that matters:
    at 100 TB it must skip ~every file without opening a footer."""
    if _UNPRUNABLE_RE.search(predicate):
        return None
    out = []
    for part in re.split(r"\band\b", predicate, flags=re.IGNORECASE):
        m = _CMP_RE.match(part)
        if not m:
            return None
        col, op, lit = m.groups()
        try:
            out.append((col, op, _parse_lit(lit)))
        except ValueError:
            return None
    return out or None


def _file_cannot_match(entry: dict, bounds) -> bool:
    """True iff the file's [min, max] stats PROVE no row satisfies the
    conjunction. Mixed-type comparisons (e.g. string stats vs numeric
    literal) never prune. String domains never prune either: Spark
    orders strings by Java UTF-16 code units while Python compares
    code points — beyond the BMP (emoji in transcripts) the orderings
    DIVERGE, so a code-point range check against code-unit-ordered
    min/max stats could wrongly prove non-match and silently skip a
    matching file. Numeric/timestamp bounds (the retention shape that
    matters at scale) are ordering-stable across both."""
    for col, op, v in bounds:
        s = entry.get(col)
        if s is None:
            continue
        fmin, fmax = s
        if isinstance(v, str) or isinstance(fmin, str) or isinstance(fmax, str):
            continue
        try:
            if op == "=" and (v < fmin or v > fmax):
                return True
            if op in ("<", "<=") and (
                fmin > v or (op == "<" and fmin >= v)
            ):
                return True
            if op in (">", ">=") and (
                fmax < v or (op == ">" and fmax <= v)
            ):
                return True
        except TypeError:
            continue
    return False


def _resolve_assignments(
    table: LakeTable, assignments: Mapping[str, Column | str]
) -> dict[str, Column]:
    if not assignments:
        raise LakeError("update_where: empty assignments")
    by_name = {f.name: f for f in table.schema.fields}
    out: dict[str, Column] = {}
    for c, v in assignments.items():
        if c not in by_name:
            raise LakeError(f"update_where: unknown column {c!r}")
        if c in table.key_cols:
            raise LakeError(
                f"update_where: {c!r} is a key column — a key change is "
                "an identity change; express it as MERGE delete+insert"
            )
        # pin the declared type: predicate DML never evolves the schema
        out[c] = _as_column(v).cast(by_name[c].dataType)
    return out


def _discover(
    table: LakeTable, match: Column, predicate_src=None
) -> tuple[list[str], list[int], int, int]:
    """(matched base-file rels, matched delta-bearing bucket ids,
    matched row count, files pruned by manifest stats) — one pass per
    file class.

    When the caller passed the predicate as a SQL STRING and it parses
    into simple range conjuncts (``_conjunct_bounds``), files whose
    manifest [min, max] stats prove zero matches are skipped before
    Spark ever lists them — run ``analyze([col])`` first; files
    without stats are always scanned (never wrongly skipped). The
    base-file scan then carries the predicate into the parquet reader
    (row-group stats prune physically) and groups by
    ``input_file_name()`` collected at execution time — the only
    file attribution that survives Spark's FileIndex coalescing
    (CLAUDE.md: inputFiles() lists pre-pruning). Delta-bearing buckets
    must collapse base+deltas before predicating on a mutable column,
    so they are discovered (and later rewritten) bucket-whole — and
    never stat-pruned (a delta may have moved a value outside the base
    file's recorded bounds).
    """
    dm = table.manifest.get("delta_files", {})
    delta_ids = sorted(int(b) for b in dm if dm[b])
    base_ids = sorted(set(range(table.num_buckets)) - set(delta_ids))

    matched_files: list[str] = []
    n_matched = 0
    n_pruned = 0
    base_files = table._files(base_ids)
    bounds = (
        _conjunct_bounds(predicate_src)
        if isinstance(predicate_src, str)
        else None
    )
    if bounds and base_files:
        # lazy scs sidecars: load only the candidate buckets' stats
        fstats = table._stats_map(base_ids)
        root = os.path.abspath(table.root)
        kept = []
        for p in base_files:
            entry = fstats.get(os.path.relpath(p, root), {})
            if entry and _file_cannot_match(entry, bounds):
                n_pruned += 1
            else:
                kept.append(p)
        base_files = kept
    if base_files:
        # deletion-vector-aware: file attribution comes from
        # `_metadata.file_path` tagged BEFORE the DV anti-join (its
        # shuffle-fallback form would break input_file_name(), which
        # only resolves inside the scan's own task), and rows already
        # position-deleted never count as matches — an UPDATE rewrite
        # counting them would resurrect them
        scan = table._with_default_fill(
            table.spark.read.schema(table.schema).parquet(*base_files)
        )
        scan = table._apply_dvs(scan, table._dv_refs(base_ids))
        per_file = (
            scan.where(match)
            .groupBy(F.col("_metadata.file_path").alias("__f"))
            .agg(F.count(F.lit(1)).alias("__n"))
            .collect()
        )
        matched_files = [_rel_of(r["__f"], table.root) for r in per_file]
        n_matched += sum(int(r["__n"]) for r in per_file)

    matched_delta: list[int] = []
    if delta_ids:
        per_bucket = (
            table.read(delta_ids)
            .where(match)
            .groupBy(
                table.bucket_of(
                    *[F.col(c) for c in table.key_cols]
                ).alias("__b")
            )
            .agg(F.count(F.lit(1)).alias("__n"))
            .collect()
        )
        matched_delta = sorted(int(r["__b"]) for r in per_bucket)
        n_matched += sum(int(r["__n"]) for r in per_bucket)
    return matched_files, matched_delta, n_matched, n_pruned


def _bucket_of_rel(rel: str) -> int:
    # data files live at data/s{v}-{uuid}/__bucket=<b>/part-*.parquet
    for part in rel.split(os.sep):
        if part.startswith(f"{BUCKET_COL}="):
            return int(part.split("=", 1)[1])
    raise LakeError(f"cannot derive bucket from data path {rel!r}")


def _forbid_legacy(table: LakeTable, mode: str, opname: str) -> None:
    """Predicate DML during a lazy-rebucket migration: CoW rewrites
    attribute files to buckets by PATH (old-spec ids would collide with
    new-spec ids) and DV gating keys new-spec bucket ids (legacy files
    never join the anti-join) — both would silently corrupt. MoR DML is
    safe: it routes through merge(), which pre-folds the legacy buckets
    its keys touch."""
    if mode != "mor" and table.legacy_pending:
        raise LakeError(
            f"{opname}(mode={mode!r}) while a lazy rebucket migration "
            "is pending is unsupported: run migrate_legacy() to "
            "completion first, or use mode='mor' (tombstones/patches "
            "route through merge, which folds as it goes)"
        )


def _record_epoch_only(table: LakeTable, epoch_id: str) -> MergeStats:
    """Metadata-only commit recording a zero-match DML epoch, so a
    replay skips the discovery scan. touched=() rebases over anything."""

    def apply(parent: dict) -> dict:
        m = dict(parent)
        m["version"] = parent["version"] + 1
        applied = dict(parent["applied_epochs"])
        applied[epoch_id] = {"version": m["version"], "ts": time.time()}
        m["applied_epochs"] = applied
        return m

    committed = table._commit_rebased(
        base=table.manifest, touched=(), apply=apply, epoch_id=epoch_id,
        op="record-epoch",
    )
    return MergeStats(
        epoch_id=epoch_id,
        version=table.version,
        skipped=committed is None,
    )


def _rewrite_commit(
    table: LakeTable,
    out: DataFrame,
    matched_files: list[str],
    matched_delta: list[int],
    *,
    epoch_id: str | None,
    target_file_bytes: int,
    op: str,
) -> dict | None:
    """Write ``out`` (already carrying BUCKET_COL) as the replacement
    for ``matched_files`` + the whole of ``matched_delta`` buckets, and
    commit. Returns the committed manifest (None = epoch already
    applied by a racer)."""
    touched = sorted(
        {_bucket_of_rel(f) for f in matched_files} | set(matched_delta)
    )
    matched_bytes = sum(
        os.path.getsize(p)
        for f in matched_files
        if os.path.exists(p := os.path.join(table.root, f))
    )
    n_parts = max(-(-matched_bytes // target_file_bytes), len(touched), 1)
    files_per = max(-(-n_parts // max(len(touched), 1)), 1)
    part_cols = [F.col(BUCKET_COL)]
    if files_per > 1:
        # seeded subsplit != the bucket hash (same hash mod two
        # divisors is correlated — CLAUDE.md): big rewrites still
        # spread across write tasks within a bucket
        part_cols.append(
            F.pmod(
                F.xxhash64(
                    F.lit(0x51F7), *[F.col(c) for c in table.key_cols]
                ),
                F.lit(files_per),
            )
        )
    new_version = table.version + 1
    snap_rel = os.path.join(DATA_DIR, f"s{new_version}-{uuid.uuid4().hex[:8]}")
    snap_abs = os.path.join(table.root, snap_rel)
    (
        out.repartition(int(n_parts), *part_cols)
        .write.partitionBy(BUCKET_COL)
        .option("compression", table._codec())
        .mode("overwrite")
        .parquet(snap_abs)
    )
    written = table._scan_written(snap_abs, snap_rel)
    removed = set(matched_files)

    def apply(parent: dict) -> dict:
        m = dict(parent)
        m["version"] = parent["version"] + 1
        new_buckets = dict(parent["buckets"])
        whole_rewritten = set(matched_delta)
        for b in touched:
            if b in matched_delta:
                # whole-bucket rewrite folded base + deltas
                new_buckets[str(b)] = written.get(str(b), [])
            else:
                kept = [
                    f for f in new_buckets.get(str(b), [])
                    if f not in removed
                ]
                new_buckets[str(b)] = kept + written.get(str(b), [])
                if not kept:
                    whole_rewritten.add(b)
        m["buckets"] = new_buckets
        # never carry delta refs across a base rewrite (CLAUDE.md)
        m["delta_files"] = {
            b: fl
            for b, fl in parent.get("delta_files", {}).items()
            if int(b) not in set(matched_delta)
        }
        # dv refs die only with a WHOLE-bucket rewrite (the read that
        # fed it was DV-filtered); a file-level rewrite keeps the
        # bucket's refs — entries for kept files are still needed and
        # entries for dead files are harmless (joins key live
        # basenames only)
        if parent.get("dv_files"):
            m["dv_files"] = {
                b: fl
                for b, fl in parent["dv_files"].items()
                if int(b) not in whole_rewritten
            }
        if epoch_id is not None:
            applied = dict(parent["applied_epochs"])
            applied[epoch_id] = {"version": m["version"], "ts": time.time()}
            m["applied_epochs"] = applied
        return m

    return table._commit_rebased(
        base=table.manifest,
        touched=touched,
        apply=apply,
        epoch_id=epoch_id,
        orphan_dir=snap_abs,
        op=op,
    )


def _dv_mutate(
    table: LakeTable,
    pred: Column,
    predicate_src,
    *,
    patch=None,
    fold=None,
    epoch_id: str | None,
    conflict_retries: int,
    target_file_bytes: int,
) -> MergeStats:
    """DELETE (``patch=None``) or UPDATE via deletion vectors
    (Iceberg v3 / Delta DV analog): append tiny position-delete files
    — (bucket, file basename, row position) — instead of rewriting
    data files (CoW) or appending full-row tombstones (MoR). For
    UPDATE, ``patch(matched_rows)`` produces the new images, appended
    as fresh base files in the same commit — the old positions vector
    out, the new rows ride a normal file-level append, and the bucket
    stays key-unique in the live view. Write cost is O(matches); read
    cost is an anti-join confined to DV-bearing buckets (see
    ``LakeTable._apply_dvs``). The cheapest mutation shape for wide
    rows; ``compact()`` folds the vectors back into the base.

    Buckets with pending MoR deltas cannot take position deletes (the
    live image of a key spans base + deltas; deleting the base
    position would resurrect nothing or the wrong image) — those
    buckets fold copy-on-write in the SAME commit via
    ``fold(bucket_rows)``, exactly like every other CoW path.
    Positions reference immutable files, so replays and concurrent
    rebases follow the standard OCC rules; a concurrent commit on a
    DV'd bucket is detected via the manifest's ``dv_files`` entry
    comparison (``_manifest_conflicts``)."""
    if fold is None:
        fold = lambda df: df.where(~pred)  # noqa: E731
    t0 = time.time()
    spark = table.spark
    for attempt in range(conflict_retries + 1):
        if (
            epoch_id is not None
            and epoch_id in table.manifest["applied_epochs"]
        ):
            return MergeStats(
                epoch_id=epoch_id, version=table.version, skipped=True
            )
        dm = table.manifest.get("delta_files", {})
        delta_all = sorted(int(b) for b in dm if dm[b])
        base_ids = sorted(set(range(table.num_buckets)) - set(delta_all))

        # ---- base buckets: collect matching (file, position) pairs
        base_files = table._files(base_ids)
        bounds = (
            _conjunct_bounds(predicate_src)
            if isinstance(predicate_src, str)
            else None
        )
        n_pruned = 0
        if bounds and base_files:
            fstats = table._stats_map(base_ids)
            root = os.path.abspath(table.root)
            kept = []
            for p in base_files:
                entry = fstats.get(os.path.relpath(p, root), {})
                if entry and _file_cannot_match(entry, bounds):
                    n_pruned += 1
                else:
                    kept.append(p)
            base_files = kept
        dv_written: dict[str, list[str]] = {}
        upd_written: dict[str, list[str]] = {}
        dv_abs = upd_abs = None
        n_base = 0
        if base_files:
            # row-lineage tables scan the stored schema so an UPDATE's
            # patched images carry their row ids into the new files;
            # default fill so the predicate (and an UPDATE's patched
            # image) sees logical values, never a pre-add NULL
            scan = table._with_default_fill(
                spark.read.schema(table._scan_schema()).parquet(
                    *base_files
                )
            )
            # DELETE scans prune to key+predicate columns; UPDATE needs
            # the full row (the patched image appends as new files)
            row_cols = ["*"] if patch is not None else []
            tagged = scan.select(
                *row_cols,
                F.col("_metadata.file_path").alias("__uri"),
                table.bucket_of(
                    *[F.col(c) for c in table.key_cols]
                ).alias("__b"),
                F.element_at(
                    F.split(F.col("_metadata.file_path"), "/"), -1
                ).alias("__name"),
                F.col("_metadata.row_index").alias("__pos"),
                F.coalesce(pred, F.lit(False)).alias("__m"),
            ).where("__m")
            # rows already position-deleted must not re-enter the
            # vector (idempotent re-delete, honest n_deleted); same
            # size-gated broadcast as _apply_dvs — a massive prior
            # delete wave must not be forced through the driver
            prior = table._dv_refs(base_ids)
            if prior:
                prior_paths = [
                    os.path.join(table.root, r) for r in prior
                ]
                old = (
                    spark.read.schema(DV_SCHEMA)
                    .parquet(*prior_paths)
                    .select("__dv_bucket", "__dv_name", "__dv_pos")
                )
                psize = 0
                for p in prior_paths:
                    try:
                        psize += os.path.getsize(p)
                    except OSError:
                        pass
                if psize <= 32 * 1024 * 1024:
                    old = F.broadcast(old)
                tagged = tagged.join(
                    old,
                    (tagged["__b"] == old["__dv_bucket"])
                    & (tagged["__name"] == old["__dv_name"])
                    & (tagged["__pos"] == old["__dv_pos"]),
                    "left_anti",
                )
            # ONE pass: scan -> filter -> write vectors, with the match
            # count observed in-flight (no separate discovery job —
            # at 10^10 rows a second full scan is the dominant cost).
            # __dv_file is a bookkeeping/debug field only (joins key
            # (bucket, basename, position)): computed in-plan as the
            # root-relative path, falling back to the raw URI for
            # out-of-root files (shallow-clone source refs)
            marker = os.path.abspath(table.root) + os.sep
            at = F.locate(marker, F.col("__uri"))
            relc = F.when(
                at > 0,
                F.col("__uri").substr(
                    at + len(marker), F.lit(1 << 20)
                ),
            ).otherwise(F.col("__uri"))
            from pyspark.sql import Observation

            obs = Observation()
            new_version = table.version + 1
            dv_rel = os.path.join(
                DATA_DIR, f"dv{new_version}-{uuid.uuid4().hex[:8]}"
            )
            dv_abs = os.path.join(table.root, dv_rel)
            if patch is not None:
                # two outputs (vectors + patched rows) off ONE scan:
                # cache the O(matches) matched set
                tagged = tagged.persist()
            try:
                (
                    tagged.select(
                        relc.alias("__dv_file"),
                        F.col("__b").alias("__dv_bucket"),
                        F.col("__name").alias("__dv_name"),
                        F.col("__pos").alias("__dv_pos"),
                        F.col("__b").alias(BUCKET_COL),
                    )
                    .observe(obs, F.count(F.lit(1)).alias("n"))
                    # consolidate: ONE vector file per touched bucket
                    # (without this, every scan task writes a sliver
                    # per bucket dir — tasks x buckets tiny files);
                    # the shuffle moves only the matches
                    .repartition(
                        min(table.num_buckets, 64), F.col(BUCKET_COL)
                    )
                    .write.partitionBy(BUCKET_COL)
                    .option("compression", table._codec())
                    .mode("overwrite")
                    .parquet(dv_abs)
                )
                dv_written = table._scan_written(dv_abs, dv_rel)
                try:
                    n_base = int(obs.get["n"])
                except Exception:
                    # Observation.get can throw on constant-folded
                    # empty plans (CLAUDE.md) — count written footers
                    import pyarrow.parquet as pq

                    n_base = sum(
                        pq.ParquetFile(
                            os.path.join(table.root, f)
                        ).metadata.num_rows
                        for fl in dv_written.values()
                        for f in fl
                    )
                if not n_base:
                    shutil.rmtree(dv_abs, ignore_errors=True)
                    dv_abs = None
                    dv_written = {}
                if patch is not None and n_base:
                    upd_rel = os.path.join(
                        DATA_DIR,
                        f"s{new_version}-{uuid.uuid4().hex[:8]}",
                    )
                    upd_abs = os.path.join(table.root, upd_rel)
                    (
                        patch(tagged)
                        .withColumn(
                            BUCKET_COL,
                            table.bucket_of(
                                *[F.col(c) for c in table.key_cols]
                            ),
                        )
                        .repartition(
                            min(table.num_buckets, 64), F.col(BUCKET_COL)
                        )
                        .write.partitionBy(BUCKET_COL)
                        .option("compression", table._codec())
                        .mode("overwrite")
                        .parquet(upd_abs)
                    )
                    upd_written = table._scan_written(upd_abs, upd_rel)
            finally:
                if patch is not None:
                    tagged.unpersist()

        # ---- delta-bearing buckets: fold copy-on-write (same commit)
        matched_delta: list[int] = []
        n_delta = 0
        if delta_all:
            per_bucket = (
                table.read(delta_all)
                .where(pred)
                .groupBy(
                    table.bucket_of(
                        *[F.col(c) for c in table.key_cols]
                    ).alias("__b")
                )
                .agg(F.count(F.lit(1)).alias("__n"))
                .collect()
            )
            matched_delta = sorted(int(r["__b"]) for r in per_bucket)
            n_delta = sum(int(r["__n"]) for r in per_bucket)
        fold_written: dict[str, list[str]] = {}
        fold_abs = None
        if matched_delta:
            survivors = fold(
                table.read(
                    matched_delta, with_lineage=table.row_lineage
                )
            ).withColumn(
                BUCKET_COL,
                table.bucket_of(*[F.col(c) for c in table.key_cols]),
            )
            fold_rel = os.path.join(
                DATA_DIR, f"s{table.version + 1}-{uuid.uuid4().hex[:8]}"
            )
            fold_abs = os.path.join(table.root, fold_rel)
            (
                survivors.repartition(
                    len(matched_delta), F.col(BUCKET_COL)
                )
                .write.partitionBy(BUCKET_COL)
                .option("compression", table._codec())
                .mode("overwrite")
                .parquet(fold_abs)
            )
            fold_written = table._scan_written(fold_abs, fold_rel)

        if not n_base and not matched_delta:
            if dv_abs:
                shutil.rmtree(dv_abs, ignore_errors=True)
            if epoch_id is not None:
                return _record_epoch_only(table, epoch_id)
            return MergeStats(epoch_id=None, version=table.version)

        touched = sorted(
            {int(b) for b in dv_written}
            | {int(b) for b in upd_written}
            | set(matched_delta)
        )
        # stats-on-write for appended patched files (empty unless the
        # stats.auto-columns property is set) — keeps read_where
        # pruning fresh, same contract as merge
        stats_patch = (
            table._collect_written_stats(
                upd_written, table._auto_stat_cols()
            )
            if upd_written
            else {}
        )

        def apply(parent: dict) -> dict:
            m = dict(parent)
            m["version"] = parent["version"] + 1
            if dv_written:
                dvs = dict(parent.get("dv_files", {}))
                for b, refs in dv_written.items():
                    dvs[b] = list(dvs.get(b, [])) + refs
                m["dv_files"] = dvs
            if matched_delta or upd_written:
                new_buckets = dict(parent["buckets"])
                for b in matched_delta:
                    new_buckets[str(b)] = fold_written.get(str(b), [])
                # UPDATE: patched images append as fresh files in their
                # buckets (file-level append; old images are vectored)
                for b, refs in upd_written.items():
                    new_buckets[b] = list(new_buckets.get(b, [])) + refs
                m["buckets"] = new_buckets
            if matched_delta:
                m["delta_files"] = {
                    b: fl
                    for b, fl in parent.get("delta_files", {}).items()
                    if int(b) not in set(matched_delta)
                }
                # folded buckets' PRIOR dv refs die with the rewrite
                # (disjoint from dv_written: vectors target base-only
                # buckets)
                if parent.get("dv_files"):
                    m["dv_files"] = {
                        b: fl
                        for b, fl in m.get(
                            "dv_files", parent["dv_files"]
                        ).items()
                        if int(b) not in set(matched_delta)
                    }
            if stats_patch:
                table._apply_stats_patch(m, parent, stats_patch)
            if epoch_id is not None:
                applied = dict(parent["applied_epochs"])
                applied[epoch_id] = {
                    "version": m["version"], "ts": time.time()
                }
                m["applied_epochs"] = applied
            return m

        try:
            committed = table._commit_rebased(
                base=table.manifest,
                touched=touched,
                apply=apply,
                epoch_id=epoch_id,
                orphan_dir=dv_abs,
                op="update-dv" if patch is not None else "delete-dv",
            )
        except CommitConflict:
            for p in (fold_abs, upd_abs):
                if p:
                    shutil.rmtree(p, ignore_errors=True)
            if attempt == conflict_retries:
                raise
            table.manifest = table._load_latest_published_manifest()
            continue
        if committed is None:  # racer applied our epoch
            for p in (fold_abs, upd_abs):
                if p:
                    shutil.rmtree(p, ignore_errors=True)
            return MergeStats(
                epoch_id=epoch_id, version=table.version, skipped=True
            )
        n_mutated = n_base + n_delta
        stats = MergeStats(
            epoch_id=epoch_id,
            version=table.version,
            buckets_touched=len(touched),
            seconds=time.time() - t0,
            extra={
                "dv_files_written": sum(len(v) for v in dv_written.values()),
                "dv_positions": n_base,
                "delta_buckets_folded": len(matched_delta),
                "files_stat_pruned": n_pruned,
                **(
                    {"files_appended": sum(
                        len(v) for v in upd_written.values()
                    )}
                    if patch is not None
                    else {}
                ),
            },
        )
        if patch is not None:
            stats.n_updated = n_mutated
        else:
            stats.n_deleted = n_mutated
        return stats


def delete_where(
    table: LakeTable,
    predicate: Column | str,
    *,
    epoch_id: str | None = None,
    mode: str = "cow",
    conflict_retries: int = 5,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> MergeStats:
    """``DELETE FROM table WHERE predicate``.

    CoW (default): rewrite only the data files that contain matching
    rows. ``mode="mor"``: append key tombstones for the matching rows
    (O(matches) write; read-side collapse drops them; ``compact_deltas``
    folds them into the base). ``mode="dv"``: append position-delete
    deletion vectors (O(matches) x 3 tiny columns — the cheapest
    delete for wide rows; see ``_dv_mutate``).
    """
    if mode not in ("cow", "mor", "dv"):
        raise LakeError(f"delete_where: unknown mode {mode!r}")
    table._forbid_staged("delete_where")
    _forbid_legacy(table, mode, "delete_where")
    pred = _match(_as_column(predicate))
    if mode == "dv":
        return _dv_mutate(
            table, pred, predicate,
            epoch_id=epoch_id,
            conflict_retries=conflict_retries,
            target_file_bytes=target_file_bytes,
        )
    if mode == "mor":
        # a tombstone only needs the key, but MoR full-row mode wants
        # every column — the matched rows already have them all
        batch = table.read().where(pred).withColumn(
            "__dml_op", F.lit("D")
        ).withColumn("__dml_seq", F.lit(0).cast("long"))
        stats = table.merge(
            batch,
            epoch_id=epoch_id,
            op_col="__dml_op",
            order_cols=("__dml_seq",),
            drop_cols=("__dml_seq",),
            mode="mor",
            conflict_retries=conflict_retries,
        )
        # MoR never reads the target at write time, so merge can't
        # attribute deletes — but a pure tombstone batch deletes
        # exactly its deduped rows
        stats.n_deleted = stats.n_deduped
        return stats

    t0 = time.time()
    for attempt in range(conflict_retries + 1):
        if (
            epoch_id is not None
            and epoch_id in table.manifest["applied_epochs"]
        ):
            return MergeStats(
                epoch_id=epoch_id, version=table.version, skipped=True
            )
        files, delta_buckets, n, n_pruned = _discover(
            table, pred, predicate
        )
        if not files and not delta_buckets:
            if epoch_id is not None:
                return _record_epoch_only(table, epoch_id)
            return MergeStats(epoch_id=None, version=table.version)
        survivors = (
            table._with_default_fill(
                table._apply_dvs(
                    # stored schema: survivors keep their row-lineage
                    # columns through the rewrite (unchanged — a delete
                    # never bumps __last_updated_version of survivors);
                    # default fill MATERIALIZES defaults into the
                    # rewritten files (they land in a post-add snapshot
                    # dir, so the read-side fill no longer applies)
                    table.spark.read.schema(table._scan_schema()).parquet(
                        *[os.path.join(table.root, f) for f in files]
                    ),
                    table._dv_refs(
                        sorted({_bucket_of_rel(f) for f in files})
                    ),
                )
            ).where(~pred)
            if files
            else None
        )
        if delta_buckets:
            folded = table.read(
                delta_buckets, with_lineage=table.row_lineage
            ).where(~pred)
            survivors = (
                folded if survivors is None
                else survivors.unionByName(folded)
            )
        out = survivors.withColumn(
            BUCKET_COL,
            table.bucket_of(*[F.col(c) for c in table.key_cols]),
        )
        try:
            committed = _rewrite_commit(
                table, out, files, delta_buckets,
                epoch_id=epoch_id, target_file_bytes=target_file_bytes,
                op="delete",
            )
        except CommitConflict:
            if attempt == conflict_retries:
                raise
            table.manifest = table._load_latest_published_manifest()
            continue
        return MergeStats(
            epoch_id=epoch_id,
            version=table.version,
            skipped=committed is None,
            n_deleted=n,
            buckets_touched=len(
                {_bucket_of_rel(f) for f in files} | set(delta_buckets)
            ),
            seconds=time.time() - t0,
            extra={"files_rewritten": len(files),
                   "files_stat_pruned": n_pruned,
                   "delta_buckets_folded": len(delta_buckets)},
        )


def update_where(
    table: LakeTable,
    predicate: Column | str,
    assignments: Mapping[str, Column | str],
    *,
    epoch_id: str | None = None,
    mode: str = "cow",
    conflict_retries: int = 5,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> MergeStats:
    """``UPDATE table SET col = expr, ... WHERE predicate``.

    Assignments see the OLD row (one projection with
    ``when(pred, expr).otherwise(col)`` per assigned column — a swap is
    a swap) and cast to the column's declared type. CoW rewrites only
    match-bearing files (non-matching rows in those files pass through
    bit-unchanged); ``mode="mor"`` appends the patched matching rows as
    O(matches) full-row deltas via MERGE; ``mode="dv"`` vectors the old
    positions out and appends ONLY the patched images as fresh base
    files (the Delta deletion-vector UPDATE shape — O(matches) writes
    like MoR but with none of MoR's read-side collapse tax; see
    ``_dv_mutate``).
    """
    if mode not in ("cow", "mor", "dv"):
        raise LakeError(f"update_where: unknown mode {mode!r}")
    table._forbid_staged("update_where")
    _forbid_legacy(table, mode, "update_where")
    pred = _match(_as_column(predicate))
    assigns = _resolve_assignments(table, assignments)
    generated = table._generated_columns()
    direct = sorted(set(assigns) & set(generated))
    if direct:
        raise LakeError(
            f"update_where: {direct} are GENERATED ALWAYS AS columns — "
            "they recompute from their sources and cannot be assigned"
        )

    def patched(df: DataFrame, only_matches: bool) -> DataFrame:
        cols = []
        for f in table.schema.fields:
            c = f.name
            if c in assigns:
                v = assigns[c] if only_matches else (
                    F.when(pred, assigns[c]).otherwise(F.col(c))
                )
                cols.append(v.alias(c))
            else:
                cols.append(F.col(c))
        if table.row_lineage and ROW_ID_COL in df.columns:
            # patched rows keep their ids; matched rows bump
            # __last_updated_version to the committing version
            # (evaluated per attempt — the OCC loop re-calls patched()
            # against the reloaded snapshot)
            bump = F.lit(table.version + 1).cast("long")
            cols.append(F.col(ROW_ID_COL))
            cols.append(
                (
                    bump
                    if only_matches
                    else F.when(pred, bump).otherwise(F.col(LAST_UPDATED_COL))
                ).alias(LAST_UPDATED_COL)
            )
        out = df.select(*cols)
        # GENERATED ALWAYS AS columns recompute AFTER the patch so they
        # see the assigned source values; unpatched rows recompute to
        # their stored value (the write invariant), so no when(pred)
        # gate is needed
        for g, e in generated.items():
            out = out.withColumn(
                g, F.expr(e).cast(table.schema[g].dataType)
            )
        return out

    if mode == "dv":
        return _dv_mutate(
            table, pred, predicate,
            patch=lambda df: patched(df, True),
            fold=lambda df: patched(df, False),
            epoch_id=epoch_id,
            conflict_retries=conflict_retries,
            target_file_bytes=target_file_bytes,
        )

    if mode == "mor":
        batch = patched(table.read().where(pred), True).withColumn(
            "__dml_op", F.lit("U")
        ).withColumn("__dml_seq", F.lit(0).cast("long"))
        stats = table.merge(
            batch,
            epoch_id=epoch_id,
            op_col="__dml_op",
            order_cols=("__dml_seq",),
            drop_cols=("__dml_seq",),
            mode="mor",
            conflict_retries=conflict_retries,
        )
        # a patch batch updates exactly its deduped rows (see delete)
        stats.n_updated = stats.n_deduped
        return stats

    t0 = time.time()
    for attempt in range(conflict_retries + 1):
        if (
            epoch_id is not None
            and epoch_id in table.manifest["applied_epochs"]
        ):
            return MergeStats(
                epoch_id=epoch_id, version=table.version, skipped=True
            )
        files, delta_buckets, n, n_pruned = _discover(
            table, pred, predicate
        )
        if not files and not delta_buckets:
            if epoch_id is not None:
                return _record_epoch_only(table, epoch_id)
            return MergeStats(epoch_id=None, version=table.version)
        rewritten = (
            patched(
                # DV-filtered: rewriting a position-deleted row into
                # the replacement file would resurrect it; default fill
                # materializes defaults into the rewritten files
                table._with_default_fill(
                    table._apply_dvs(
                        table.spark.read.schema(
                            table._scan_schema()
                        ).parquet(
                            *[os.path.join(table.root, f) for f in files]
                        ),
                        table._dv_refs(
                            sorted({_bucket_of_rel(f) for f in files})
                        ),
                    )
                ),
                False,
            )
            if files
            else None
        )
        if delta_buckets:
            folded = patched(
                table.read(delta_buckets, with_lineage=table.row_lineage),
                False,
            )
            rewritten = (
                folded if rewritten is None
                else rewritten.unionByName(folded)
            )
        out = rewritten.withColumn(
            BUCKET_COL,
            table.bucket_of(*[F.col(c) for c in table.key_cols]),
        )
        try:
            committed = _rewrite_commit(
                table, out, files, delta_buckets,
                epoch_id=epoch_id, target_file_bytes=target_file_bytes,
                op="update",
            )
        except CommitConflict:
            if attempt == conflict_retries:
                raise
            table.manifest = table._load_latest_published_manifest()
            continue
        return MergeStats(
            epoch_id=epoch_id,
            version=table.version,
            skipped=committed is None,
            n_updated=n,
            buckets_touched=len(
                {_bucket_of_rel(f) for f in files} | set(delta_buckets)
            ),
            seconds=time.time() - t0,
            extra={"files_rewritten": len(files),
                   "files_stat_pruned": n_pruned,
                   "delta_buckets_folded": len(delta_buckets)},
        )
