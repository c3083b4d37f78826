"""Structured-Streaming lake SINK: ``df.writeStream.format("lake")``.

The write-side complement of :mod:`.cdf_source` (``format("lake_cdf")``)
— together they make the lake a first-class Spark streaming endpoint:
``readStream`` a change feed out, ``writeStream`` change batches in,
no ``foreachBatch`` user code. Recasts the reference's sink seam
(``RTabular`` writers, /root/reference/src/RTable/Core.hs:1662-1688)
onto PySpark 4's Python DataSource streaming-writer API.

Execution shape (the O(batch) MoR ingest path):

- **Executors** (:meth:`LakeMoRSinkWriter.write`): receive the
  micro-batch partition as Arrow ``RecordBatch``es (the
  ``DataSourceStreamArrowWriter`` fast path — no per-row Python),
  optionally LWW-dedup it in-task with DuckDB (rows for one key are
  co-located when the frame is repartitioned by ``__bucket``; see
  :func:`prepare_sink_frame`), stamp ``__op``/``__commit_seq``/
  ``__cols`` exactly like ``LakeTable._append_mor_delta``
  (lake/table.py:4393), and write one parquet file per touched bucket
  into a fresh per-task snapshot dir ``data/s{seq}-{uuid8}/`` via
  ``pyarrow.dataset`` hive partitioning (``__bucket=N/`` — the same
  layout Spark's ``partitionBy`` produces, partition column dropped
  from file contents).

- **Driver commit worker** (:meth:`LakeMoRSinkWriter.commit`): runs in
  a bare Python worker with NO SparkSession (same constraint the CDF
  source's planner methods live under), so the commit is pure manifest
  machinery: a metadata-only CAS commit registering the staged files
  as MoR delta files through ``_commit_rebased`` — O(touched buckets),
  no data rewrite. Exactly-once rides the lake's epoch ledger: epoch
  ``{prefix}-b{batchId}`` no-ops on re-delivery after a checkpoint
  restart (staged files of the replay attempt are deleted).

__commit_seq under concurrency
------------------------------
Delta ordering requires that within any bucket, file seqs strictly
increase with commit order. Executors bake ``seq = head_version + 1``
read from shared storage at write time; the commit worker verifies
each staged file's seq is exactly ``current_head + 1`` and, when a
foreign commit landed in between (seq now stale), REWRITES the staged
files' seq column with pyarrow before registering — single-process
but O(micro-batch) and only on the race path. Disjoint-bucket rebases
inside ``_commit_rebased`` keep staged seqs valid for the same reason
``_append_mor_delta`` documents: no intermediate commit touched these
buckets, so every existing delta there has seq <= base < ours.

Guards (refused at stream start, same posture as the CDF source):
row-lineage tables (MoR rejected there anyway), generated columns
(the sink cannot recompute them), column defaults (staged snapshot
dirs carry a provisional version in their path — the default-fill
version parse would mis-resolve), declared CHECK constraints and
expectations (the gate cannot run without Spark — use the
``foreachBatch`` merge path), and tables mid lazy-rebucket migration
(the sink cannot fold legacy buckets). Mid-stream schema evolution
fails the commit with an explicit restart message: MoR full-row
deltas must carry every current schema column (CLAUDE.md contract).

At 100 TB: each micro-batch writes O(batch) delta bytes + one
O(touched buckets) metadata commit; read-side collapse and
``compact_deltas()`` amortize exactly as for batch MoR merges. The
per-task DuckDB dedup holds one task partition in memory — size the
stream's shuffle width so partitions fit, the same contract as any
Arrow-batched stage.
"""
from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Iterator, TYPE_CHECKING

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)

if TYPE_CHECKING:  # pragma: no cover
    import pyarrow as pa
    from pyspark.sql import DataFrame, SparkSession

OP_COL = "__op"
SEQ_COL = "__commit_seq"
COLS_COL = "__cols"
BUCKET = "__bucket"
MAX_COMMIT_RETRIES = 5


@dataclass
class _SinkCommit(WriterCommitMessage):
    """Per-task staging receipt: which files went where at what seq."""

    snap_rel: str = ""
    seq: int = 0
    n_rows: int = 0
    files: dict = field(default_factory=dict)  # bucket(str) -> [rel paths]


def _load_table(root: str):
    """Metadata-only table handle — valid in Spark-less workers
    (``LakeTable.load`` never touches ``spark`` for manifest ops)."""
    from ..lake.table import LakeTable

    return LakeTable.load(None, root)


class LakeMoRSinkWriter(DataSourceStreamArrowWriter):
    def __init__(self, options: dict, schema):
        self.root = options.get("root")
        if not self.root:
            raise ValueError("lake sink: option 'root' is required")
        self.dedup = (options.get("dedup") or "none").lower()
        if self.dedup not in ("none", "lww"):
            raise ValueError("lake sink: dedup must be 'none' or 'lww'")
        oc = options.get("order_cols", options.get("ordercols"))
        self.order_cols = (
            [c.strip() for c in oc.split(",") if c.strip()]
            if oc
            else ["ts", "seq"]
        )
        self.epoch_prefix = options.get(
            "epoch_prefix", options.get("epochprefix", "sink")
        )
        tbl = _load_table(self.root)
        m = tbl.manifest
        if tbl.row_lineage:
            # the engine supports full-row MoR on lineage tables, but
            # this sink's executor-side delta writer has no access to
            # the manifest's next_row_id high-water mark to allocate
            # provisional ids — route through foreachBatch merge
            raise ValueError(
                "lake sink: cannot allocate row-lineage ids from "
                "executors — use the foreachBatch merge path "
                "(mode='cow' or 'mor')"
            )
        if m.get("generated_columns"):
            raise ValueError(
                "lake sink: cannot recompute GENERATED ALWAYS AS "
                "columns — use the foreachBatch merge path"
            )
        if m.get("column_defaults"):
            raise ValueError(
                "lake sink: tables with unmaterialized column defaults "
                "are unsupported (staged snapshot paths carry a "
                "provisional writing version) — compact to materialize "
                "defaults first"
            )
        if m.get("constraints"):
            raise ValueError(
                "lake sink: declared CHECK constraints cannot be "
                "validated Spark-less at commit — use the foreachBatch "
                "merge path"
            )
        if tbl.legacy_pending:
            raise ValueError(
                "lake sink: lazy rebucket migration pending — run "
                "migrate_legacy()/rebucket() to completion first"
            )
        self.key_cols = tbl.key_cols
        self.payload = [
            f.name for f in tbl.schema.fields if f.name not in self.key_cols
        ]
        self.schema_names = list(tbl.schema.names)
        # the sink's input contract: key + payload (+ __op) + __bucket,
        # plus any non-schema LWW order columns (the merge's
        # order_cols=("ts","seq") contract — carried through the
        # in-task dedup, dropped before the delta write)
        names = [f.name for f in schema.fields]
        expected = set(self.schema_names) | {BUCKET}
        optional = {OP_COL} | set(self.order_cols)
        missing = [
            c for c in self.schema_names + [BUCKET] if c not in names
        ]
        extra = [c for c in names if c not in expected | optional]
        if missing or extra:
            raise ValueError(
                "lake sink: input must carry exactly the table columns "
                f"plus {BUCKET} (and optionally {OP_COL}) — use "
                "prepare_sink_frame(); missing="
                f"{missing} unexpected={extra}"
            )
        self.has_op = OP_COL in names

    # ------------------------------------------------------ executors
    def write(self, iterator: Iterator["pa.RecordBatch"]) -> _SinkCommit:
        import pyarrow as pa
        import pyarrow.dataset as pads

        from ..lake.table import DATA_DIR, LakeTable

        batches = [b for b in iterator if b.num_rows]
        if not batches:
            return _SinkCommit()
        t = pa.Table.from_batches(batches)
        if self.dedup == "lww":
            t = self._dedup_lww(t)
        # seq = head + 1 read from shared storage NOW; the commit
        # worker re-validates (and re-seqs on a lost race)
        head = LakeTable._latest_published_version(self.root)
        if head is None:
            raise ValueError(f"lake sink: no table at {self.root}")
        seq = int(head) + 1
        n = t.num_rows
        if not self.has_op:
            t = t.append_column(
                OP_COL, pa.array(["U"] * n, type=pa.string())
            )
        t = t.append_column(
            SEQ_COL, pa.array([seq] * n, type=pa.int64())
        )
        # full-row deltas: this batch SETS every payload column
        # (constant per file: RLE-compressed to nothing)
        t = t.append_column(
            COLS_COL,
            pa.array([",".join(self.payload)] * n, type=pa.string()),
        )
        # file column order mirrors _append_mor_delta's select; carried
        # non-schema order columns are dropped here (dedup-only)
        t = t.select(
            self.key_cols + self.payload + [OP_COL, SEQ_COL, COLS_COL, BUCKET]
        )
        snap_rel = os.path.join(DATA_DIR, f"s{seq}-{uuid.uuid4().hex[:8]}")
        snap_abs = os.path.join(self.root, snap_rel)
        written: list[str] = []
        pads.write_dataset(
            t,
            snap_abs,
            format="parquet",
            partitioning=pads.partitioning(
                pa.schema([(BUCKET, pa.int32())]), flavor="hive"
            ),
            basename_template=(
                f"part-{uuid.uuid4().hex[:12]}-{{i}}.parquet"
            ),
            existing_data_behavior="overwrite_or_ignore",
            file_visitor=lambda f: written.append(f.path),
        )
        files: dict[str, list[str]] = {}
        for p in written:
            rel = os.path.relpath(p, self.root)
            bdir = os.path.basename(os.path.dirname(rel))
            b = bdir.split("=", 1)[1]
            files.setdefault(b, []).append(rel)
        return _SinkCommit(
            snap_rel=snap_rel, seq=seq, n_rows=n, files=files
        )

    def _dedup_lww(self, t: "pa.Table") -> "pa.Table":
        """In-task last-writer-wins: one row per key per task. Correct
        batch-wide when the frame is repartitioned by ``__bucket`` (or
        the keys) upstream — :func:`prepare_sink_frame` does this — so
        all rows of a key land in one task. Mirrors the merge's
        ``max_by(struct(order_cols))`` rule (lake/table.py:3841)."""
        import duckdb

        order = [c for c in self.order_cols if c in t.column_names]
        if not order:
            return t
        con = duckdb.connect()
        con.register("t", t)
        keys = ", ".join(f'"{c}"' for c in self.key_cols)
        ords = ", ".join(f'"{c}" DESC NULLS LAST' for c in order)
        out = con.execute(
            f"SELECT * FROM t QUALIFY row_number() OVER "
            f"(PARTITION BY {keys} ORDER BY {ords}) = 1"
        ).fetch_arrow_table()
        con.close()
        return out.cast(t.schema)

    # ------------------------------------------------ driver (commit)
    def _cleanup(self, messages) -> None:
        import shutil

        for msg in messages:
            if msg and msg.snap_rel:
                shutil.rmtree(
                    os.path.join(self.root, msg.snap_rel),
                    ignore_errors=True,
                )

    def _reseq(self, msg: _SinkCommit, seq: int) -> _SinkCommit:
        """Rewrite a staged attempt's ``__commit_seq`` to ``seq`` (a
        foreign commit claimed our number). Single-process pyarrow over
        one micro-batch's files — the rare race path only."""
        import shutil

        import pyarrow as pa
        import pyarrow.parquet as pq

        from ..lake.table import DATA_DIR

        new_rel = os.path.join(DATA_DIR, f"s{seq}-{uuid.uuid4().hex[:8]}")
        files: dict[str, list[str]] = {}
        for b, rels in msg.files.items():
            for rel in rels:
                t = pq.read_table(os.path.join(self.root, rel))
                idx = t.column_names.index(SEQ_COL)
                t = t.set_column(
                    idx,
                    SEQ_COL,
                    pa.array([seq] * t.num_rows, type=pa.int64()),
                )
                out_rel = os.path.join(
                    new_rel, f"{BUCKET}={b}", os.path.basename(rel)
                )
                out_abs = os.path.join(self.root, out_rel)
                os.makedirs(os.path.dirname(out_abs), exist_ok=True)
                pq.write_table(t, out_abs)
                files.setdefault(b, []).append(out_rel)
        shutil.rmtree(
            os.path.join(self.root, msg.snap_rel), ignore_errors=True
        )
        return _SinkCommit(
            snap_rel=new_rel, seq=seq, n_rows=msg.n_rows, files=files
        )

    def commit(self, messages, batchId: int) -> None:
        from ..lake.table import CommitConflict, MergeStats

        epoch = f"{self.epoch_prefix}-b{batchId}"
        msgs = [m for m in messages if m and m.files]
        tbl = _load_table(self.root)
        if epoch in tbl.applied_epochs():
            # checkpoint-restart re-delivery: exactly-once demands a
            # no-op; drop the replay attempt's staged files
            self._cleanup(msgs)
            return
        if not msgs:
            return  # empty batch: nothing to register, no epoch burn
        if set(tbl.schema.names) != set(self.schema_names):
            self._cleanup(msgs)
            raise ValueError(
                "lake sink: table schema evolved mid-stream "
                f"({sorted(set(tbl.schema.names) ^ set(self.schema_names))})"
                " — full-row MoR deltas must carry every current "
                "column; restart the stream to pick up the new schema"
            )
        t0 = time.time()
        for _ in range(MAX_COMMIT_RETRIES + 1):
            want = tbl.version + 1
            msgs = [
                m if m.seq == want else self._reseq(m, want) for m in msgs
            ]
            touched = sorted(
                {int(b) for m in msgs for b in m.files}
            )
            written: dict[str, list[str]] = {}
            for m in msgs:
                for b, fl in m.files.items():
                    written.setdefault(b, []).extend(fl)

            def apply(parent: dict) -> dict:
                manifest = dict(parent)
                manifest["version"] = parent["version"] + 1
                nd = {
                    b: list(fl)
                    for b, fl in parent.get("delta_files", {}).items()
                }
                for b, fl in written.items():
                    nd.setdefault(b, []).extend(fl)
                manifest["delta_files"] = nd
                applied = dict(parent["applied_epochs"])
                applied[epoch] = {
                    "version": manifest["version"], "ts": time.time()
                }
                manifest["applied_epochs"] = applied
                return manifest

            try:
                committed = tbl._commit_rebased(
                    base=tbl.manifest, touched=touched, apply=apply,
                    epoch_id=epoch, op="sink-append",
                )
            except CommitConflict:
                # overlapping-bucket race: reload, re-seq, retry
                tbl = _load_table(self.root)
                if epoch in tbl.applied_epochs():
                    self._cleanup(msgs)
                    return
                continue
            if committed is None:  # racing writer applied our epoch
                self._cleanup(msgs)
                return
            stats = MergeStats(
                epoch_id=epoch,
                version=committed["version"],
                n_source=sum(m.n_rows for m in msgs),
                n_deduped=sum(m.n_rows for m in msgs),
                buckets_touched=len(touched),
                seconds=time.time() - t0,
                extra={"mode": "sink-mor", "batch_id": int(batchId)},
            )
            tbl._write_lineage(stats, written)
            return
        raise RuntimeError(
            f"lake sink: commit of batch {batchId} lost "
            f"{MAX_COMMIT_RETRIES + 1} consecutive overlapping-bucket "
            "races — surface to the stream for retry"
        )

    def abort(self, messages, batchId: int) -> None:
        self._cleanup([m for m in messages if m])


class LakeSinkDataSource(DataSource):
    """``format("lake")`` — register once per session with
    ``spark.dataSource.register(LakeSinkDataSource)`` (or use
    :func:`write_lake_stream`)."""

    @classmethod
    def name(cls) -> str:
        return "lake"

    def streamWriter(self, schema, overwrite: bool) -> LakeMoRSinkWriter:
        if overwrite:
            raise ValueError(
                "lake sink: outputMode('complete') unsupported — the "
                "sink appends MoR deltas (use 'append' or 'update')"
            )
        return LakeMoRSinkWriter(dict(self.options), schema)


def prepare_sink_frame(
    table, df: "DataFrame", *, op_col: str | None = "op",
    width: int | None = None, carry: tuple = (),
) -> "DataFrame":
    """Shape a (streaming or batch) frame for ``format("lake")``:
    project to the table's columns in schema order with exact-type
    casts, carry the change op as ``__op`` (absent ⇒ all upserts),
    apply the NULL-key rule (default tables DROP NULL-keyed rows;
    ``nullable_keys`` tables keep them — same contract as ``merge``),
    and stamp ``__bucket`` with the table's own JVM ``xxhash64``
    bucket expression — bit-identical routing, computed Spark-side
    where it is free. ``width`` repartitions by bucket so the sink's
    in-task LWW dedup sees every row of a key (required when
    ``option("dedup", "lww")`` is set and the source may emit a key
    twice per micro-batch). ``carry`` keeps extra non-schema columns
    (feed-only LWW order columns like ``seq``) through to the sink's
    dedup — name them in the sink's ``order_cols`` option; they never
    reach the delta files."""
    from pyspark.sql import functions as F

    schema = table.schema
    out = df.select(
        *[F.col(f.name).cast(f.dataType) for f in schema.fields],
        *[F.col(c) for c in carry],
        *(
            [F.col(op_col).cast("string").alias(OP_COL)]
            if op_col and op_col in df.columns
            else []
        ),
        table.bucket_of(
            *[df[c] for c in table.key_cols]
        ).alias(BUCKET),
    )
    if not table.manifest.get("nullable_keys"):
        for k in table.key_cols:
            out = out.where(F.col(k).isNotNull())
    if width:
        out = out.repartition(int(width), F.col(BUCKET))
    return out


def write_lake_stream(
    df: "DataFrame", root: str, *, checkpoint: str,
    dedup: str = "none", order_cols: str = "ts,seq",
    epoch_prefix: str = "sink", trigger: dict | None = None,
):
    """Start (and return) the streaming write into the lake table at
    ``root``. ``df`` must already be shaped by
    :func:`prepare_sink_frame`. Idempotent registration; exactly-once
    rides ``{epoch_prefix}-b{batchId}`` epochs in the table's ledger."""
    spark = df.sparkSession
    spark.dataSource.register(LakeSinkDataSource)
    w = (
        df.writeStream.format("lake")
        .option("root", root)
        .option("dedup", dedup)
        .option("order_cols", order_cols)
        .option("epoch_prefix", epoch_prefix)
        .option("checkpointLocation", checkpoint)
    )
    if trigger:
        w = w.trigger(**trigger)
    return w.start()
