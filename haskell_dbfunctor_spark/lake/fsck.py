"""Lake table integrity verifier (``fsck``) — the operational check a
100 TB table needs before anyone trusts a migration, a restore from
backup, a deep clone, or a GC sweep that ran with the wrong grace.

Two tiers:

- **Metadata tier (default)** — no Spark jobs, O(manifest) file-system
  stats: every file the CURRENT manifest references must exist
  (data/delta/DV parquet, spilled sc-*/scb-*/scs-* sidecars, the NDV
  blob); bucket ids must be in range; the applied-epoch log and
  row-lineage high-water mark must be internally consistent; the
  published parent chain must be walkable (missing EXPIRED parents are
  normal and reported as info, not errors).
- **Deep tier (``deep=True``)** — Spark scans, O(table): every live
  row must hash to the bucket directory it is stored in (a misplaced
  row silently escapes every pruned read and every keyed merge), keys
  must be unique in the live view (the merge invariant), and on
  row-lineage tables ``__row_id`` must be unique and below the
  manifest's ``next_row_id`` allocator mark.

``fsck`` never mutates anything — it is the report-only complement of
``remove_orphans`` (which deletes the INVERSE set: files no manifest
references). A clean run returns ``{"ok": True, "errors": []}``; every
error string names the object so the fix is scriptable.

The reference has no durability surface at all (its tables live and
die inside one process, /root/reference/src/RTable/Core.hs); fsck
exists because this engine's tables are long-lived shared state.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from .table import BUCKET_COL, MANIFEST_DIR, ROW_ID_COL, LakeTable


def fsck(table: LakeTable, *, deep: bool = False) -> dict:
    """Verify the CURRENT snapshot's integrity. Returns::

        {"ok": bool, "version": int, "errors": [...], "warnings": [...],
         "checked": {counts per object class}, "deep": bool}

    ``errors`` are integrity violations (a referenced file is gone, a
    row is in the wrong bucket, duplicate keys); ``warnings`` are
    survivable oddities (dead DV entries pointing at rewritten files —
    harmless by the carried-refs rule; an expired parent chain).
    """
    errors: list[str] = []
    warnings: list[str] = []
    checked: dict[str, int] = {}
    m = table.manifest
    root = table.root
    nb = table.num_buckets
    version = table.version

    # ---- referenced files exist
    def _check_refs(kind: str, per_bucket: dict) -> None:
        n = 0
        for b, files in (per_bucket or {}).items():
            try:
                bid = int(b)
            except (TypeError, ValueError):
                errors.append(f"{kind}: non-integer bucket key {b!r}")
                continue
            if not (0 <= bid < nb):
                errors.append(
                    f"{kind}: bucket {bid} out of range [0, {nb})"
                )
            for rel in files:
                n += 1
                p = rel if os.path.isabs(rel) else os.path.join(root, rel)
                if not os.path.exists(p):
                    errors.append(f"{kind}: missing file {rel}")
        checked[kind] = n

    _check_refs("data", m.get("buckets", {}))
    _check_refs("delta", m.get("delta_files", {}))
    _check_refs("dv", m.get("dv_files", {}))

    # ---- spilled metadata sidecars exist (raw manifest keys — the
    # hydrated manifest hides them, so read the file directly)
    raw_path = os.path.join(root, MANIFEST_DIR, f"v{version}.json")
    try:
        with open(raw_path) as fh:
            raw = json.load(fh)
    except OSError as exc:
        errors.append(f"manifest: cannot read v{version}.json ({exc})")
        raw = {}
    n_side = 0
    for key in ("bucket_refs", "bloom_refs", "stats_refs"):
        for b, ref in (raw.get(key) or {}).items():
            n_side += 1
            if not os.path.exists(os.path.join(root, MANIFEST_DIR, ref)):
                errors.append(f"{key}: missing sidecar {ref} (bucket {b})")
    if raw.get("ndv_ref"):
        n_side += 1
        if not os.path.exists(
            os.path.join(root, MANIFEST_DIR, raw["ndv_ref"])
        ):
            errors.append(f"ndv_ref: missing blob {raw['ndv_ref']}")
    checked["sidecars"] = n_side

    # ---- applied-epoch log sanity
    bad_epochs = [
        e for e, v in m.get("applied_epochs", {}).items()
        if int(v.get("version", -1)) > version
    ]
    if bad_epochs:
        errors.append(
            f"applied_epochs: {len(bad_epochs)} entries claim a version "
            f"past the current head v{version} (e.g. {bad_epochs[0]!r})"
        )
    checked["epochs"] = len(m.get("applied_epochs", {}))

    # ---- DV entries pointing at basenames no live file carries: the
    # carried-refs rule makes these harmless (joins key live names);
    # report as warning so operators can tell "stale ref" from "lost
    # data file" (which shows up above as a missing-file ERROR)
    dvm = m.get("dv_files", {})
    if dvm:
        import pyarrow.parquet as pq

        live_names = {
            os.path.basename(f)
            for files in m.get("buckets", {}).values()
            for f in files
        }
        dead = 0
        for b, refs in dvm.items():
            for rel in refs:
                p = rel if os.path.isabs(rel) else os.path.join(root, rel)
                if not os.path.exists(p):
                    continue  # already an error above
                try:
                    tbl = pq.read_table(p, columns=["__dv_name"])
                except Exception as exc:  # corrupt vector file
                    errors.append(f"dv: unreadable vector {rel} ({exc})")
                    continue
                dead += sum(
                    1
                    for nm in set(tbl.column("__dv_name").to_pylist())
                    if nm not in live_names
                )
        if dead:
            warnings.append(
                f"dv: {dead} distinct vectored basenames reference "
                "rewritten (dead) files — harmless carried refs; "
                "compact() folds them away"
            )

    # ---- parent chain walkability (time travel / CDF depth)
    depth = 0
    v = m.get("parent")
    while v is not None:
        p = os.path.join(root, MANIFEST_DIR, f"v{v}.json")
        if not os.path.exists(p):
            warnings.append(
                f"chain: parent v{v} expired — time travel and "
                f"changes() reach back {depth} versions from the head"
            )
            break
        depth += 1
        try:
            with open(p) as fh:
                v = json.load(fh).get("parent")
        except (OSError, ValueError) as exc:
            errors.append(f"chain: unreadable manifest v{v}.json ({exc})")
            break
    checked["chain_depth"] = depth

    # ---- row-lineage allocator mark present
    if table.row_lineage and "next_row_id" not in m:
        errors.append("lineage: row_lineage table missing next_row_id")

    # ---- deep tier: full-scan invariants
    if deep and not any(e.startswith(("data", "delta")) for e in errors):
        key_cols = list(table.key_cols)

        # (1) physical placement: every base-file row must hash to the
        # bucket directory it sits in. Raw scan (pre-DV, pre-collapse:
        # placement is a file-layout property, dead rows included).
        files = table._files()
        if files:
            scan = table._with_default_fill(
                table.spark.read.schema(table._scan_schema())
                .parquet(*files)
            )
            placed = scan.select(
                table.bucket_of(*[F.col(c) for c in key_cols]).alias(
                    "__want"
                ),
                F.regexp_extract(
                    F.col("_metadata.file_path"),
                    f"{BUCKET_COL}=(\\d+)", 1,
                ).cast("int").alias("__have"),
            )
            n_misplaced = placed.where(
                F.col("__want") != F.col("__have")
            ).count()
            if n_misplaced:
                errors.append(
                    f"placement: {n_misplaced} rows stored in a bucket "
                    "directory their keys do not hash to"
                )
            checked["rows_scanned"] = scan.count()

        # (2) live-view key uniqueness (the merge invariant). groupBy
        # treats NULLs as equal — matching nullable_keys identity.
        live = table.read()
        dup = (
            live.groupBy(*key_cols)
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > 1)
        )
        n_dup = dup.count()
        if n_dup:
            errors.append(
                f"uniqueness: {n_dup} key groups have >1 live row"
            )
        checked["live_keys"] = live.count() if n_dup == 0 else -1

        # (3) row-lineage: ids unique and below the allocator HWM
        if table.row_lineage:
            lin = table.read(with_lineage=True)
            agg = lin.agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct(ROW_ID_COL).alias("nd"),
                F.max(ROW_ID_COL).alias("mx"),
            ).first()
            if agg["n"] and agg["nd"] != agg["n"]:
                errors.append(
                    f"lineage: {agg['n'] - agg['nd']} duplicate "
                    f"{ROW_ID_COL} values in the live view"
                )
            hwm = int(m.get("next_row_id", 0))
            if agg["mx"] is not None and int(agg["mx"]) >= hwm:
                errors.append(
                    f"lineage: max {ROW_ID_COL} {agg['mx']} >= "
                    f"next_row_id {hwm} — allocator mark behind data"
                )

    return {
        "ok": not errors,
        "version": version,
        "deep": bool(deep),
        "errors": errors,
        "warnings": warnings,
        "checked": checked,
    }
