"""Symlink-format manifest export — external engines read the table.

Delta Lake's ``GENERATE symlink_format_manifest`` analog: write a
plain-text listing of the snapshot's LIVE data files (absolute paths,
one per line) plus a schema sidecar, so engines with no lake code —
DuckDB, Trino/Presto/Athena-style external tables, plain
``pyarrow.dataset`` — can read the CURRENT table state as ordinary
parquet. The manifest names exactly the base files of one committed
snapshot, so the external view is a consistent point-in-time read
(later commits write new files and a new manifest; they never mutate
listed files).

The export REFUSES whenever raw parquet would diverge from
``table.read()`` — honesty over convenience:

- pending MoR deltas / partial-patch markers (read-side collapse
  would be skipped) → ``compact_deltas()`` first;
- deletion vectors (position deletes live outside the data files) →
  ``compact()`` first;
- column defaults not yet materialized in every live file (pre-add
  files read the default through the engine but NULL through raw
  parquet) — detected by an O(files) driver-side footer walk, so a
  fully-compacted table with historical defaults exports fine.

Columns the external reader must project are pinned in the schema
sidecar: dropped/renamed columns may still exist physically in
un-rewritten files, and row-lineage tables carry hidden ``__row_id``
columns — a reader that selects the sidecar's column list gets
exactly ``table.read()``.
"""

from __future__ import annotations

import json
import os
import uuid

from .table import LakeError, LakeTable


def export_symlink_manifest(
    table: LakeTable, dest: str | None = None
) -> dict:
    """Write ``manifest-v{N}.txt`` (absolute live file paths) and
    ``schema-v{N}.json`` (projection columns + snapshot version) under
    ``dest`` (default ``<root>/_symlink_format_manifest``), plus
    atomically-replaced ``manifest.txt``/``schema.json`` pointers to
    the newest export. Returns {version, n_files, manifest, schema}.
    """
    m = table.manifest
    if any(v for v in (m.get("delta_files") or {}).values()) or m.get(
        "partial_delta_files"
    ):
        raise LakeError(
            "export_symlink_manifest: pending MoR deltas — raw parquet "
            "reads would skip the read-side collapse; run "
            "compact_deltas() first"
        )
    if any(v for v in (m.get("dv_files") or {}).values()):
        raise LakeError(
            "export_symlink_manifest: live deletion vectors — raw "
            "parquet reads would resurrect deleted rows; run "
            "compact(dv_ratio=0.0) first (0.0 folds EVERY DV-bearing "
            "bucket; the default only folds ratio-hot ones)"
        )
    defaults = m.get("column_defaults") or {}
    files: list[str] = []
    for rels in (m.get("buckets") or {}).values():
        files.extend(os.path.join(table.root, rel) for rel in rels)
    # lazy-rebucket overlay files are plain materialized base parquet
    # (no deltas/DVs can reference them by invariant) — a raw reader
    # unioning them with the new-spec files sees exactly table.read();
    # the default-materialization walk below covers them like any file
    for rels in (m.get("legacy_buckets") or {}).values():
        files.extend(os.path.join(table.root, rel) for rel in rels)
    if defaults and files:
        import pyarrow.parquet as pq

        missing = []
        for p in files:
            have = set(pq.ParquetFile(p).schema_arrow.names)
            gap = [c for c in defaults if c not in have]
            if gap:
                missing.append((os.path.basename(p), gap))
        if missing:
            raise LakeError(
                "export_symlink_manifest: column defaults not "
                "materialized in every live file (raw parquet reads "
                f"NULL where the engine reads the default): {missing[:3]}"
                f"{'...' if len(missing) > 3 else ''} — rewrite every "
                "bucket first (rebucket(num_buckets) or "
                "compact(sort_by=...); the default compact skips "
                "already-tidy buckets), then re-export"
            )
    out = dest or os.path.join(table.root, "_symlink_format_manifest")
    os.makedirs(out, exist_ok=True)
    v = table.version
    man_path = os.path.join(out, f"manifest-v{v}.txt")
    sch_path = os.path.join(out, f"schema-v{v}.json")
    body = "".join(sorted(os.path.abspath(p) + "\n" for p in files))
    schema = {
        "version": v,
        "columns": list(table.schema.names),
        "key_cols": list(table.key_cols),
        "root": os.path.abspath(table.root),
    }

    def _atomic(path: str, text: str) -> None:
        tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            fh.write(text)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, path)

    _atomic(man_path, body)
    _atomic(sch_path, json.dumps(schema))
    # "latest" pointers: external tables usually mount a FIXED path;
    # atomic rename keeps concurrent readers on one snapshot or the
    # other, never a torn listing
    _atomic(os.path.join(out, "manifest.txt"), body)
    _atomic(os.path.join(out, "schema.json"), json.dumps(schema))
    return {
        "version": v,
        "n_files": len(files),
        "manifest": man_path,
        "schema": sch_path,
    }
