"""Multi-table atomic transactions over :class:`LakeTable`.

Real CDC pipelines rarely land in ONE table: a transcript upsert and
its derived metrics/lineage rollup must appear together or not at all
(a reader joining transcripts to a metrics table that is one epoch
ahead silently double-counts). Single-table commits here are already
atomic (CAS manifest claims, ``table.py``); this module adds the
cross-table commit point the reference's single-process ETL gets for
free by writing all its ``RTable`` outputs in one driver
(``/root/reference/src/Etl/Julius.hs`` evaluates a whole Julius chain
in memory and only then materializes results): a **catalog-serialized
two-phase protocol** built from pieces the lake already has —
write-audit-publish staging and epoch-idempotent ``publish``.

Protocol (all metadata-only, O(tables) tiny JSON files — nothing here
touches data paths, so it costs the same at 100 TB as at 100 MB):

1. **Stage**: every ``Transaction.merge`` runs the normal bucketed
   MERGE with ``stage_only=True`` — full data write, invisible to
   readers. Each merge gets a txn-unique ``epoch_id`` (the idempotence
   token roll-forward relies on).
2. **Intent**: ``commit()`` CAS-claims the next slot in the catalog's
   intent log (``txns/t{N}.json`` via ``os.link``, same CAS as
   manifest commits). The log ORDER is the serialization order of all
   transactions on this catalog.
3. **Validate**: with the slot held and every earlier intent resolved,
   each table's staged chain is prechecked against its current
   published head (same overlap rules as ``LakeTable.publish``). Any
   conflict → the txn claims its own decision as ``abort`` and raises:
   NOTHING was published — atomic abort; the staged chains are
   invisible and ``expire_snapshots`` reclaims them.
4. **Decide**: the commit point is a CAS claim of
   ``txns/t{N}.decision.json`` with ``{"decision": "commit"}``. Losing
   the claim means a concurrent :meth:`Catalog.recover` stole an
   ``abort`` (it found the intent undecided and cannot tell a slow
   writer from a dead one — stealing abort is always safe because no
   table publishes before the decision exists).
5. **Roll forward**: after the commit decision, every table's staged
   head is ``publish()``-ed. A crash anywhere here is repaired by
   :meth:`Catalog.recover` (run by the next transaction and by
   ``Catalog.read``): publish is idempotent — a raced or repeated
   publish of the same epochs no-ops — so owner and recoverer may even
   publish concurrently.

Safety argument: readers only see published snapshots; no publish
happens before a durable ``commit`` decision; decisions are totally
ordered by the intent log and every participant resolves all earlier
intents before deciding, so validation always ran against a head that
includes every committed predecessor. Crash before the decision →
recovery aborts (nothing was visible); crash after → recovery
completes the publishes (epoch idempotence makes repeats no-ops).

Discipline: tables governed by a catalog should be written THROUGH
transactions (single-table txns are fine and cheap). An out-of-band
``merge`` on a governed table is safe while it touches disjoint
buckets (publish fast-forwards past it) but an overlapping one between
a txn's decision and its roll-forward leaves the txn un-completable —
:meth:`Catalog.recover` surfaces that as a loud :class:`LakeError`
naming the table instead of looping. This mirrors Iceberg, where
multi-table commits are only atomic when every writer goes through the
same catalog.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from .table import (
    MANIFEST_DIR,
    CommitConflict,
    LakeError,
    LakeTable,
    MergeStats,
    _atomic_claim_json,
    _atomic_write_json,
    _read_manifest_file,
)

_INTENT_RE = re.compile(r"^t(\d{8})\.json$")


def _read_json(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def _manifest(root: str, version: int) -> dict:
    # hydrates spilled (two-level) manifests back to the inline shape
    return _read_manifest_file(
        root, os.path.join(root, MANIFEST_DIR, f"v{version}.json")
    )


class TransactionAborted(CommitConflict):
    """The transaction was aborted (validation conflict, or a
    concurrent ``recover`` stole the decision); nothing was published.
    Re-run the transaction against the current table heads."""


class Catalog:
    """A directory of transaction metadata serializing multi-table
    commits. One catalog per set of co-committed tables; the catalog
    does NOT own the tables (they keep their roots), it owns the
    intent log."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.txn_dir = os.path.join(root, "txns")
        os.makedirs(self.txn_dir, exist_ok=True)

    # ------------------------------------------------------------ log
    def _intent_ids(self) -> list[int]:
        ids = []
        for name in os.listdir(self.txn_dir):
            m = _INTENT_RE.match(name)
            if m:
                ids.append(int(m.group(1)))
        return sorted(ids)

    def _paths(self, n: int) -> tuple[str, str, str]:
        base = os.path.join(self.txn_dir, f"t{n:08d}")
        return f"{base}.json", f"{base}.decision.json", f"{base}.done.json"

    def history(self) -> list[dict]:
        """Intent log with decisions — the catalog's audit trail."""
        out = []
        for n in self._intent_ids():
            intent_p, dec_p, done_p = self._paths(n)
            rec = _read_json(intent_p)
            rec["slot"] = n
            rec["decision"] = (
                _read_json(dec_p)["decision"] if os.path.exists(dec_p) else None
            )
            rec["applied"] = os.path.exists(done_p)
            out.append(rec)
        return out

    # ------------------------------------------------------- recovery
    def _decide(self, n: int, decision: str) -> str:
        """CAS-claim slot ``n``'s decision; return the winning one."""
        _, dec_p, _ = self._paths(n)
        try:
            _atomic_claim_json(
                dec_p, {"decision": decision, "ts": time.time()}
            )
            return decision
        except CommitConflict:
            return _read_json(dec_p)["decision"]

    def _apply(self, n: int, intent: dict) -> None:
        """Roll a commit-decided intent forward (idempotent)."""
        _, _, done_p = self._paths(n)
        if os.path.exists(done_p):
            return
        for troot, staged_v in intent["tables"].items():
            handle = LakeTable.load(self.spark, troot, version=staged_v)
            try:
                handle.publish(staged_v)
            except CommitConflict as exc:
                raise LakeError(
                    f"txn slot {n}: committed but table {troot} cannot "
                    "fast-forward — an out-of-band writer published "
                    "overlapping buckets after the commit decision. "
                    "Re-merge that table's staged batches manually; "
                    "route all writes to catalog tables through "
                    f"transactions. ({exc})"
                ) from exc
        _atomic_write_json(done_p, {"ts": time.time()})

    def recover(
        self, *, upto: int | None = None, grace_s: float = 5.0
    ) -> dict:
        """Resolve every pending intent (optionally only slots <
        ``upto``): undecided intents are stolen-aborted (safe — nothing
        publishes before a decision exists), commit-decided ones are
        rolled forward. Run automatically by ``begin().commit()`` and
        :meth:`read`; safe to run any time, from any process.

        ``grace_s``: an undecided intent younger than this is likely a
        LIVE writer between its slot claim and its decision (a
        metadata-only window of milliseconds) — recovery polls for its
        decision instead of stealing the abort immediately, so
        concurrent readers don't spuriously abort healthy committers.
        Past the grace the steal proceeds: a dead writer must not
        wedge the log."""
        stats = {"applied": 0, "aborted": 0, "skipped": 0}
        for n in self._intent_ids():
            if upto is not None and n >= upto:
                break
            intent_p, dec_p, done_p = self._paths(n)
            if os.path.exists(done_p):
                stats["skipped"] += 1
                continue
            if not os.path.exists(dec_p):
                born = _read_json(intent_p).get("ts", 0)
                while (
                    not os.path.exists(dec_p)
                    and time.time() - born < grace_s
                ):
                    time.sleep(0.05)
            decision = self._decide(n, "abort")
            if decision == "commit":
                self._apply(n, _read_json(intent_p))
                stats["applied"] += 1
            else:
                stats["aborted"] += 1
        return stats

    def _hwm(self) -> int:
        p = os.path.join(self.txn_dir, "hwm.json")
        try:
            return _read_json(p)["hwm"]
        except (OSError, KeyError, ValueError):
            return 0

    def expire(self, keep_last: int = 16) -> dict:
        """Truncate the intent log: drop RESOLVED intents (aborted, or
        committed AND fully applied), keeping the newest ``keep_last``.
        Serialization only matters among unresolved intents and their
        successors; a resolved prefix is history — the committed work
        is durable in each table's manifests, and aborted chains are
        reclaimed by per-table ``expire_snapshots``. Keeps the log
        O(recent) so recover()/read() never walk an unbounded
        directory.

        Crash-safe order: done marker, then decision, then intent —
        every partial state re-resolves correctly (a lingering intent
        without its decision is stolen-aborted, which is a no-op for an
        already-applied txn). A high-water mark pins the next slot
        number past everything ever removed so a truncated-empty log
        cannot reuse a slot whose sibling files a crash left behind."""
        ids = self._intent_ids()
        candidates = ids[:-keep_last] if keep_last else ids
        removed = 0
        hwm = self._hwm()
        for n in candidates:
            intent_p, dec_p, done_p = self._paths(n)
            if not os.path.exists(dec_p):
                break  # unresolved — keep it and everything after
            if _read_json(dec_p)["decision"] == "commit" and not (
                os.path.exists(done_p)
            ):
                break  # committed but not fully applied yet
            hwm = max(hwm, n)
            _atomic_write_json(
                os.path.join(self.txn_dir, "hwm.json"), {"hwm": hwm}
            )
            for p in (done_p, dec_p, intent_p):
                try:
                    os.unlink(p)
                except FileNotFoundError:
                    pass
            removed += 1
        return {"removed": removed, "kept": len(ids) - removed}

    def read(self, table_root: str, **load_kwargs) -> LakeTable:
        """Open a governed table with read-time repair: completes any
        crashed-but-committed transaction first, so a reader never
        observes a half-applied txn as the steady state."""
        self.recover()
        return LakeTable.load(self.spark, table_root, **load_kwargs)

    def _log_fingerprint(self) -> tuple:
        """The catalog's visible-state fingerprint: every intent slot
        with its decision and applied flag. Any transaction that
        publishes between two identical fingerprints is impossible —
        a publish requires a new decided intent (or applying an
        existing one), both of which change the fingerprint."""
        out = []
        for n in self._intent_ids():
            _, dec_p, done_p = self._paths(n)
            dec = (
                _read_json(dec_p)["decision"]
                if os.path.exists(dec_p) else None
            )
            out.append((n, dec, os.path.exists(done_p)))
        return tuple(out)

    def snapshot(
        self, table_roots: list[str], *, retries: int = 10
    ) -> dict[str, "LakeTable"]:
        """Pinned handles forming a CONSISTENT cross-table read point.

        Multi-table commits are atomic, but two independent ``load()``
        calls can still straddle one (read A, txn publishes A+B, read
        B: the pair is torn). ``snapshot`` repairs pending txns, pins
        every table at its current published version, then re-checks
        the intent-log fingerprint — unchanged means no catalog
        transaction completed between the pins, so the set reflects a
        prefix of the serialized txn history; changed means a possible
        tear, retry. Data files are immutable (copy-on-write), so the
        pinned versions stay readable regardless of later commits.
        Only catalog-governed writes are fenced: an out-of-band
        single-table ``merge`` is invisible to the fingerprint (the
        same discipline caveat as the commit path)."""
        for _ in range(retries):
            self.recover()
            before = self._log_fingerprint()
            handles = {
                r: LakeTable.load(
                    self.spark, r,
                    version=LakeTable._latest_published_version(r),
                )
                for r in table_roots
            }
            if self._log_fingerprint() == before:
                return handles
        raise LakeError(
            f"snapshot: txn log kept advancing through {retries} "
            "attempts; retry under less commit churn"
        )

    # ---------------------------------------------------- catalog tags
    def _tag_path(self, name: str) -> str:
        if not re.fullmatch(r"[A-Za-z0-9._-]{1,64}", name):
            raise LakeError(f"invalid catalog tag name {name!r}")
        return os.path.join(self.root, "tags", f"{name}.json")

    def tag(self, name: str, table_roots: list[str]) -> dict:
        """Durable CONSISTENT cross-table tag — "the corpus + rollups +
        indexes we trained run X on" as ONE name: pins a
        :meth:`snapshot` (tear-free read point), places a table-level
        tag ref ``cat-<name>`` on every member (so each table's
        ``expire_snapshots`` keeps the pinned version readable for as
        long as the catalog tag lives), then CAS-claims
        ``tags/<name>.json`` in the catalog. Immutable once claimed
        (``delete_tag`` first to move it); a lost claim race rolls the
        per-table refs back and raises."""
        handles = self.snapshot(list(table_roots))
        path = self._tag_path(name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        ref = f"cat-{name}"
        placed: list[LakeTable] = []
        try:
            for t in handles.values():
                t.tag(ref, t.version)
                placed.append(t)
            payload = {
                "name": name,
                "created_at": time.time(),
                "tables": {
                    os.path.abspath(r): h.version
                    for r, h in handles.items()
                },
            }
            _atomic_claim_json(path, payload)
            return payload
        except (LakeError, CommitConflict, FileExistsError):
            for t in placed:
                try:
                    t.delete_tag(ref)
                except LakeError:
                    pass
            raise

    def load_tag(self, name: str) -> dict[str, LakeTable]:
        """Handles pinned at the tagged versions — byte-stable forever
        (CoW files + the per-table refs shield them from expiry)."""
        rec = _read_json(self._tag_path(name))
        return {
            r: LakeTable.load(self.spark, r, version=v)
            for r, v in rec["tables"].items()
        }

    def delete_tag(self, name: str) -> dict:
        """Drop the catalog tag AND its per-table refs (the pinned
        snapshots become expirable again). Missing per-table refs are
        tolerated — deletion must be re-runnable after a crash."""
        path = self._tag_path(name)
        try:
            rec = _read_json(path)
        except FileNotFoundError:
            raise LakeError(f"no catalog tag {name!r}")
        for r in rec["tables"]:
            try:
                LakeTable.load(self.spark, r).delete_tag(f"cat-{name}")
            except (LakeError, OSError):
                pass
        os.unlink(path)
        return rec

    def tags(self) -> list[str]:
        d = os.path.join(self.root, "tags")
        if not os.path.isdir(d):
            return []
        return sorted(
            n[:-5] for n in os.listdir(d) if n.endswith(".json")
        )

    def begin(self) -> "Transaction":
        return Transaction(self)


class Transaction:
    """One multi-table unit of work. Not thread-safe; one writer."""

    def __init__(self, catalog: Catalog):
        self.catalog = catalog
        self.txn_id = uuid.uuid4().hex[:16]
        # root -> staged head version; insertion order = publish order
        self._staged: dict[str, int] = {}
        self._handles: dict[str, LakeTable] = {}
        self._n_merges = 0
        self._closed = False

    def merge(
        self, table: LakeTable, changes: DataFrame, **opts
    ) -> MergeStats:
        """Stage a MERGE into ``table`` as part of this transaction.
        Accepts every ``LakeTable.merge`` option except ``stage_only``
        (forced True). ``epoch_id`` defaults to a txn-unique token —
        required for idempotent roll-forward, so passing an explicit
        one must still be unique per merge."""
        if self._closed:
            raise LakeError("transaction already committed/aborted")
        if opts.pop("stage_only", True) is not True:
            raise LakeError("transaction merges are always staged")
        opts.setdefault(
            "epoch_id", f"txn-{self.txn_id}-{self._n_merges}"
        )
        self._n_merges += 1
        root = table.root
        handle = self._handles.get(root, table)
        stats = handle.merge(changes, stage_only=True, **opts)
        self._handles[root] = handle
        if not stats.skipped:
            # an epoch-idempotent skip stages nothing: the handle still
            # sits on its published head, which must NOT be recorded as
            # a publish target (publish would reject a non-staged
            # version — and there is nothing to make visible anyway)
            self._staged[root] = handle.version
        return stats

    def abort(self) -> None:
        """Walk away: staged chains become invisible garbage that
        ``expire_snapshots`` reclaims. Nothing was ever published."""
        self._closed = True
        self._staged.clear()

    # ------------------------------------------------------- internals
    def _claim_slot(self) -> int:
        intent = {
            "txn_id": self.txn_id,
            "tables": dict(self._staged),
            "ts": time.time(),
        }
        while True:
            ids = self.catalog._intent_ids()
            n = max(
                (ids[-1] + 1) if ids else 1, self.catalog._hwm() + 1
            )
            intent_p, _, _ = self.catalog._paths(n)
            try:
                _atomic_claim_json(intent_p, intent)
                return n
            except CommitConflict:
                continue  # lost the slot race; take the next number

    def _precheck(self, root: str, staged_v: int) -> bool:
        """Would ``publish(staged_v)`` fast-forward cleanly against the
        table's CURRENT published head? Same rules as
        ``LakeTable.publish`` (overlapping buckets / schema / bucket
        count / constraint DDL since the staged chain's fork point)."""
        staged = _manifest(root, staged_v)
        base = _manifest(root, staged["wap_base"])
        pub_v = LakeTable._latest_published_version(root)
        pub = _manifest(root, pub_v)
        sb, bb = staged["buckets"], base["buckets"]
        sd = staged.get("delta_files", {})
        bd = base.get("delta_files", {})
        sv = staged.get("dv_files", {})
        bv = base.get("dv_files", {})
        touched = [
            int(b)
            for b in set(sb) | set(bb) | set(sd) | set(bd) | set(sv) | set(bv)
            if sb.get(str(b), []) != bb.get(str(b), [])
            or sd.get(str(b), []) != bd.get(str(b), [])
            or sv.get(str(b), []) != bv.get(str(b), [])
        ]
        return not LakeTable._manifest_conflicts(
            base, pub, touched,
            lineage_reserved=bool(staged.get("lineage_reservation")),
        ) and (
            pub.get("constraints") == base.get("constraints")
        )

    def commit(self) -> dict:
        """Atomically publish every staged table (all or nothing).

        Returns ``{"slot": N, "tables": {root: staged_version}}``.
        Raises :class:`TransactionAborted` when validation finds a
        conflicting committed predecessor (or a concurrent recover
        stole the decision) — in both cases nothing was published and
        the whole transaction should be re-run from fresh handles.
        """
        if self._closed:
            raise LakeError("transaction already committed/aborted")
        if not self._staged:
            self._closed = True
            return {"slot": None, "tables": {}}
        cat = self.catalog
        cat.recover()
        slot = self._claim_slot()
        # intents claimed between our recover() and our claim are our
        # predecessors in serialization order — resolve them before
        # validating, so validation sees every committed head
        cat.recover(upto=slot)
        self._closed = True
        if not all(
            self._precheck(root, v) for root, v in self._staged.items()
        ):
            cat._decide(slot, "abort")
            raise TransactionAborted(
                f"txn slot {slot}: a committed predecessor overlaps a "
                "staged table; re-run against the current heads"
            )
        if cat._decide(slot, "commit") != "commit":
            raise TransactionAborted(
                f"txn slot {slot}: decision stolen by concurrent "
                "recovery; re-run the transaction"
            )
        cat._apply(slot, {"tables": dict(self._staged)})
        return {"slot": slot, "tables": dict(self._staged)}
