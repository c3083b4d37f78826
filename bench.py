#!/usr/bin/env python
"""Benchmark runner (driver contract + scaling evidence).

Default mode: run every query from ``__spark_entry__.queries()`` against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` plus one CDC replay throughput run, and
print ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``--cdc N`` mode: run only the CDC replay (generate feed -> epoch MERGE
loop into a fresh LakeTable) at the current parallelism and print a JSON
line with events/sec. Used as the subprocess body of ``--scaling``.

``--scaling`` mode: the north-rule evidence. Runs the *same* CDC replay
job on the *same* deterministic input at two parallelism levels
(default local[8] vs local[32] — N and 4N cores, the sandbox stand-in
for N and 4N executors; local mode fixes parallelism at JVM start, so
each level runs in its own subprocess) and reports throughput at both
plus scaling efficiency = (T_small / T_large) / (cores_large /
cores_small).

Each query is materialized with a ``noop``-format write so the full
physical plan executes on the executors without a driver-side collect.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CDC_EVENTS_DEFAULT = 2_000_000
CDC_EPOCHS = 8


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _cpu_sample() -> tuple[float, float]:
    """(steal_ticks, total_ticks) from /proc/stat — bursty co-tenants on
    this host steal CPU; runs report their steal share so noisy
    measurements are identifiable."""
    try:
        parts = open("/proc/stat").readline().split()[1:]
        vals = [float(x) for x in parts]
        return vals[7] if len(vals) > 7 else 0.0, sum(vals)
    except Exception:
        return 0.0, 0.0


def run_cdc(
    spark, n_events: int, n_epochs: int = CDC_EPOCHS,
    feed_kwargs: dict | None = None, mode: str = "cow",
    index: str | None = None, term_index: str | None = None,
    agg_view: bool = False, agg_view_every: int = 1,
) -> dict:
    """One full CDC replay: deterministic feed (materialized once, read
    back per epoch with partition pruning — a WAL is storage, not a
    generator) -> epoch loop of LWW dedup + bucket-pruned MERGE +
    checkpoint into a fresh LakeTable. ``feed_kwargs`` override the
    generator's skew profile (--skew mode)."""
    from haskell_dbfunctor_spark.cdc.apply import open_or_create_transcripts, replay
    from haskell_dbfunctor_spark.cdc.generator import change_feed

    # RAM-backed table root when available: the sandbox's virtio disk
    # has ~3x run-to-run write-latency variance that swamps any scaling
    # signal; tmpfs isolates the compute we are actually measuring (a
    # real cluster writes to object storage with scaled-out bandwidth)
    base = os.environ.get("SPARK_GRAFT_BENCH_DIR")
    root = tempfile.mkdtemp(prefix="bench_lake_", dir=base)
    try:
        feed_src = change_feed(
            spark,
            n_events,
            n_convs=max(n_events // 200, 100),
            n_epochs=n_epochs,
            evolution_epoch=n_epochs // 2,
            **(feed_kwargs or {}),
        )
        feed_path = os.path.join(root, "_feed")
        feed_src.write.partitionBy("epoch").parquet(feed_path)
        feed = spark.read.parquet(feed_path)

        table = open_or_create_transcripts(spark, root, num_buckets=64)
        dedup_index = catalog = None
        if index:  # "cow" | "mor": maintain the signature index in the
            # same per-epoch transaction (--index-cost mode)
            from haskell_dbfunctor_spark.cdc.apply import (
                open_or_create_dedup_index,
            )
            from haskell_dbfunctor_spark.lake.transaction import Catalog

            # match the state table's bucket count: the index shuffles
            # the same key space, and 16 buckets would cap its merge
            # parallelism at half the cores
            dedup_index = open_or_create_dedup_index(
                spark, os.path.join(root, "_dedup_ix"), num_buckets=64
            )
            catalog = Catalog(spark, os.path.join(root, "_catalog"))
        term_ix = None
        if term_index:  # "cow" | "mor": postings index in the same txn
            from haskell_dbfunctor_spark.cdc.apply import (
                open_or_create_term_index,
            )
            from haskell_dbfunctor_spark.lake.transaction import Catalog

            term_ix = open_or_create_term_index(
                spark, os.path.join(root, "_term_ix"), num_buckets=64
            )
            if catalog is None:
                catalog = Catalog(spark, os.path.join(root, "_catalog"))
        av = None
        av_gcols = ("role",)
        av_specs = ()
        if agg_view:  # async incremental aggregate view leg
            from haskell_dbfunctor_spark.lake.agg_view import (
                Max, Min, open_or_create_agg_view,
            )

            av_specs = (Min("ts", "first_ts"), Max("ts", "last_ts"),
                        Max("turn_idx", "max_turn"))
            av = open_or_create_agg_view(
                spark, os.path.join(root, "_agg_view"), table,
                list(av_gcols), list(av_specs),
            )
        st0, tt0 = _cpu_sample()
        stats = replay(
            table, feed, n_epochs, evolution_epoch=n_epochs // 2,
            files_per_bucket=2, mode=mode,
            # MoR defers work to compaction — charge it inside the
            # measured window (a production schedule folds deltas
            # periodically; write-only throughput would overstate MoR)
            compact_every=(
                max(n_epochs // 2, 1)
                if (mode in ("mor", "dv") or index == "mor"
                    or term_index == "mor") else None
            ),
            dedup_index=dedup_index,
            catalog=catalog,
            dedup_index_mode=index or "cow",
            term_index=term_ix,
            term_index_mode=term_index or "cow",
            agg_view=av,
            agg_view_group_cols=av_gcols,
            agg_view_specs=av_specs,
            agg_view_every=agg_view_every,
        )
        # odd epoch counts leave the final epochs' deltas pending —
        # fold them INSIDE the timed window so the headline charges
        # every deferred cost (the comment in the output says so)
        extra_compact = 0.0
        if mode == "mor" and table.manifest.get("delta_files"):
            t_c = time.time()
            table.compact_deltas()
            extra_compact = time.time() - t_c
        if mode == "dv" and any(
            table.manifest.get("dv_files", {}).values()
        ):
            t_c = time.time()
            table.compact(dv_ratio=0.0)
            extra_compact = time.time() - t_c
        if (
            index == "mor"
            and dedup_index.manifest.get("delta_files")
        ):
            t_c = time.time()
            dedup_index.compact_deltas()
            extra_compact += time.time() - t_c
        if (
            term_index == "mor"
            and term_ix.manifest.get("delta_files")
        ):
            t_c = time.time()
            term_ix.compact_deltas()
            extra_compact += time.time() - t_c
        st1, tt1 = _cpu_sample()
        final_rows = table.read().count()
        # steady state = excluding epoch 0 (JVM/codegen warmup dominates
        # the first epoch regardless of parallelism). BOTH modes use
        # wall time after epoch 0 — including replay loop overhead and,
        # for MoR, the scheduled + final compactions — so the two
        # headline numbers are apples-to-apples.
        warm = stats.per_epoch[1:]
        warm_events = sum(m.n_source for m in warm)
        warm_secs = (
            stats.seconds - stats.per_epoch[0].seconds + extra_compact
        )
        steal_pct = (
            100.0 * (st1 - st0) / (tt1 - tt0) if tt1 > tt0 else 0.0
        )
        try:  # 1-min loadavg: co-tenant pressure that steal% misses
            load1 = float(open("/proc/loadavg").read().split()[0])
        except Exception:
            load1 = -1.0
        return {
            "n_events": n_events,
            "n_epochs": n_epochs,
            "mode": mode,
            # leg-local dosimeter: endpoint calibs bracket the WHOLE
            # bench run and miss a ~30s co-tenant burst inside one CDC
            # leg (observed 2026-08-20: one 4x-slow CoW leg between
            # two quiet endpoint calibs) — sample right after the leg
            "calib_s": calibration_seconds(),
            "host_load1": load1,
            "seconds": round(stats.seconds, 3),
            "events_per_sec": round(stats.events_per_sec, 1),
            "steady_seconds": round(warm_secs, 3),
            "steady_events_per_sec": round(
                warm_events / warm_secs if warm_secs else 0.0, 1
            ),
            "final_rows": final_rows,
            "host_steal_pct": round(steal_pct, 1),
            **(
                {
                    "index": index,
                    "index_rows": dedup_index.read().count(),
                }
                if index
                else {}
            ),
            **(
                {
                    "term_index": term_index,
                    "term_index_rows": term_ix.read().count(),
                }
                if term_index
                else {}
            ),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _get_spark(cores: int):
    from haskell_dbfunctor_spark.session import get_spark

    extra = {}
    base = os.environ.get("SPARK_GRAFT_BENCH_DIR")
    if base:
        shuffle_dir = os.path.join(base, "spark-local")
        os.makedirs(shuffle_dir, exist_ok=True)
        extra["spark.local.dir"] = shuffle_dir
    return get_spark(app_name=f"bench-local{cores}", cores=cores, extra_conf=extra)


def calibration_seconds(n: int = 3_000_000) -> float:
    """Single-thread fixed CPU workload — a contention dosimeter.

    This Firecracker VM is throttled by its hypervisor WITHOUT
    reporting steal time (measured: loadavg 10+ with zero runnable
    local processes and vmstat st=0), so neither loadavg nor steal
    reliably flags a slow window. A fixed pure-Python loop does: its
    wall time scales directly with whatever CPU the guest actually
    gets. Quiet reference on this box: ~0.30 s (minimum of repeated
    samples, 2026-08-17). Ratio observed/quiet ≈ the inflation factor
    to divide out of this run's timings."""
    t0 = time.perf_counter()
    x = 0
    for _ in range(n):
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF
    return round(time.perf_counter() - t0, 3)


def main_bench(sf_dir: str, cores: int, cdc_events: int) -> None:
    import __spark_entry__ as entry_mod

    if "SPARK_GRAFT_BENCH_DIR" not in os.environ and os.path.isdir("/dev/shm"):
        d = "/dev/shm/hdbf_bench"
        os.makedirs(d, exist_ok=True)
        os.environ["SPARK_GRAFT_BENCH_DIR"] = d
    def _load1() -> float:
        try:
            return float(open("/proc/loadavg").read().split()[0])
        except Exception:
            return -1.0

    load_start = _load1()
    calib_start = calibration_seconds()
    spark = _get_spark(cores)
    # JVM/codegen/reader warmup so the first timed query isn't charged
    # one-time session costs (~4-7s of Janino compilation + scan +
    # shuffle init). The timed list now leads with a HEAVY query
    # (driver-coverage ordering), so warm the codegen shapes it uses —
    # agg, shuffle join, window, explode — not just a scan: measured
    # +7s on the first query when warmup was scan-only.
    from pyspark.sql import Window as _W, functions as _F
    base = spark.range(1_000_000).select(
        _F.col("id"), (_F.col("id") % 97).alias("k"),
    )
    (
        base.groupBy("k").agg(_F.sum("id").alias("s"))
        .join(base.sample(0.01), "k")
        .withColumn("rn", _F.row_number().over(
            _W.partitionBy("k").orderBy("id")))
        .select(_F.explode(_F.array("id", "s")).alias("x"))
        .write.format("noop").mode("overwrite").save()
    )
    spark.read.parquet(f"{sf_dir}/region.parquet").write.format("noop").mode(
        "overwrite"
    ).save()
    # lake-machinery warmup: the timed list leads with lake/IVM queries
    # (q180/q181 run first for driver coverage), whose merge / CDF-diff
    # / view-sync code paths carry their OWN first-use JIT (~10s
    # measured on q180 when warmup stopped at the generic shapes). One
    # micro lake cycle — create, two merges, net diff, agg-view sync —
    # compiles them outside the timed window.
    try:
        import shutil as _sh
        import tempfile as _tf

        from haskell_dbfunctor_spark.lake.agg_view import (
            Max as _Mx, create_agg_view as _cav, sync_agg_view as _sav,
        )
        from haskell_dbfunctor_spark.lake.table import LakeTable as _LT
        import pyspark.sql.types as _T

        _wroot = _tf.mkdtemp(prefix="hdbf_warm_", dir=os.environ.get(
            "SPARK_GRAFT_BENCH_DIR") or None)
        _ws = _T.StructType([
            _T.StructField("k", _T.LongType()),
            _T.StructField("g", _T.StringType()),
            _T.StructField("v", _T.LongType()),
        ])
        _wt = _LT.create(spark, f"{_wroot}/t", _ws, key_cols=["k"],
                         num_buckets=2)
        _wb = spark.range(200).select(
            _F.col("id").alias("k"),
            (_F.col("id") % 3).cast("string").alias("g"),
            _F.col("id").alias("v"), _F.lit("U").alias("op"),
        )
        _wt.merge(_wb, epoch_id="w0", order_cols=("k",), drop_cols=())
        _wv = _cav(spark, f"{_wroot}/v", _wt, ["g"], [_Mx("v", "vmax")])
        _sav(_wt, _wv, ["g"], [_Mx("v", "vmax")])
        _wt.merge(_wb.where("k < 50"), epoch_id="w1",
                  order_cols=("k",), drop_cols=())
        _wt.changes(1, 2, preimages=True).write.format("noop").mode(
            "overwrite").save()
        _sav(_wt, _wv, ["g"], [_Mx("v", "vmax")])
        # STREAMING warmup (round 5, VERDICT r04 item 7): the six
        # streaming queries each pay distinct first-use machinery —
        # MicroBatchExecution + state store, the Python stateful
        # runner (applyInPandasWithState), watermark dedup, stream-
        # stream join, and the lake streaming source — measured ~24s
        # of one-time cost across the cold pass at sf0.001 (q44 alone
        # 18.3s cold vs 4.3s warm). Four micro streams over a 64-row
        # source compile all of them outside the timed window.
        _ssrc = f"{_wroot}/ssrc"
        spark.range(64).select(
            (_F.col("id") % 8).alias("user_id"),
            _F.timestamp_seconds(
                _F.lit(1_700_000_000) + _F.col("id")
            ).alias("ts"),
            _F.col("id").cast("double").alias("value"),
        ).write.parquet(_ssrc)

        def _wdrain(df, name, mode="append"):
            q = (
                df.writeStream.format("noop").outputMode(mode)
                .option("checkpointLocation", f"{_wroot}/ck_{name}")
                .trigger(availableNow=True).start()
            )
            q.awaitTermination(120)

        _srd = spark.readStream.schema(
            "user_id long, ts timestamp, value double"
        )
        # watermark + dedup-within-watermark + session-window agg
        _wdrain(
            _srd.parquet(_ssrc).withWatermark("ts", "10 seconds")
            .dropDuplicatesWithinWatermark(["user_id", "ts"])
            .groupBy(
                _F.session_window("ts", "5 seconds"), _F.col("user_id")
            )
            .agg(_F.count(_F.lit(1)).alias("n")),
            "sess",
        )
        # Python stateful runner (the q44 machinery)
        from haskell_dbfunctor_spark.streaming.stateful import (
            running_key_stats as _rks,
        )

        _wdrain(
            _rks(_srd.parquet(_ssrc), ["user_id"]), "stateful",
            mode="update",
        )
        # stream-stream interval join
        _l = _srd.parquet(_ssrc).withWatermark("ts", "10 seconds")
        _r = (
            spark.readStream.schema(
                "user_id long, ts timestamp, value double"
            )
            .parquet(_ssrc)
            .withWatermark("ts", "10 seconds")
            .select(
                _F.col("user_id").alias("r_uid"),
                _F.col("ts").alias("r_ts"),
            )
        )
        _wdrain(
            _l.join(
                _r,
                (_F.col("user_id") == _F.col("r_uid"))
                & (_F.col("r_ts") >= _F.col("ts"))
                & (_F.col("r_ts") <= _F.col("ts") + _F.expr(
                    "interval 5 seconds")),
            ),
            "ssjoin",
        )
        # lake streaming source (CDF drain off the warmup table)
        from haskell_dbfunctor_spark.streaming.cdf_source import (
            read_cdf_stream as _rcs,
        )

        q = (
            _rcs(spark, f"{_wroot}/t", starting_version=0)
            .writeStream.format("noop")
            .option("checkpointLocation", f"{_wroot}/ck_lcdf")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        # lake streaming SINK (format("lake") writer init, q175's path)
        from haskell_dbfunctor_spark.streaming.lake_sink import (
            prepare_sink_frame as _psf, write_lake_stream as _wls,
        )

        _sfeed = f"{_wroot}/sfeed"
        spark.range(32).select(
            _F.col("id").alias("k"),
            (_F.col("id") % 3).cast("string").alias("g"),
            _F.col("id").alias("v"), _F.lit("U").alias("op"),
        ).write.parquet(_sfeed)
        q = _wls(
            _psf(
                _wt,
                spark.readStream.schema(
                    "k long, g string, v long, op string"
                ).parquet(_sfeed),
                op_col="op",
            ),
            f"{_wroot}/t",
            checkpoint=f"{_wroot}/ck_lsink",
            dedup="none",
            trigger={"availableNow": True},
        )
        q.awaitTermination(120)
        _sh.rmtree(_wroot, ignore_errors=True)
    except Exception:
        pass  # warmup must never fail the bench
    timings: dict[str, float] = {}
    for name, fn in entry_mod.queries().items():
        t0 = time.time()
        _materialize(fn(spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    cdc = run_cdc(spark, cdc_events, n_epochs=4)
    cdc_mor = run_cdc(spark, cdc_events, n_epochs=4, mode="mor")
    total = round(sum(timings.values()), 3)
    calib_end = calibration_seconds()
    heavies = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    detail = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(sf_dir),
        "cores": cores,
        "cdc": cdc,
        "cdc_mor": cdc_mor,
        "cdc_events_per_sec": cdc_mor["steady_events_per_sec"],
        "cdc_events_per_sec_cow": cdc["steady_events_per_sec"],
        "host_load1_start": load_start,
        "host_load1_end": _load1(),
        "calib_s_start": calib_start,
        "calib_s_end": calib_end,
    }
    # Full per-query detail goes to a sidecar file: the 100-query
    # timings dict pushed the stdout JSON line past the driver's ~2.2KB
    # tail-capture window in round 2, front-truncating the line into
    # unparseability (BENCH_r02 parsed: null). stdout carries a compact
    # summary (headline total, CDC steady rates, calibration dosimeter,
    # 5 heaviest queries) that fits well inside the capture window.
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_DETAIL.json"), "w") as fh:
            json.dump(detail, fh, indent=1)
    except OSError:
        pass
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": heavies,  # 5 heaviest; full dict in BENCH_DETAIL.json
        "n_queries": len(timings),
        "sf": _sf_of(sf_dir),
        "cores": cores,
        # headline = merge-on-read, the production mode at 10^10 scale
        # (an epoch is <<1% of the table; CoW would rewrite O(table)
        # per epoch). Both modes produce identical final state, and the
        # MoR timing INCLUDES its periodic delta compaction, so the
        # deferred cost is charged — not a write-only number.
        "cdc_events_per_sec": cdc_mor["steady_events_per_sec"],
        "cdc_events_per_sec_cow": cdc["steady_events_per_sec"],
        # co-tenant context (see BENCH.md): single-thread CPU dosimeter,
        # quiet ~0.30s; divide timings by calib/0.30 before comparing
        "host_load1_start": load_start,
        "host_load1_end": _load1(),
        "calib_s_start": calib_start,
        "calib_s_end": calib_end,
        "detail_file": "BENCH_DETAIL.json",
    }))


def main_cdc(cores: int, n_events: int, n_epochs: int = CDC_EPOCHS,
             mode: str = "cow") -> None:
    spark = _get_spark(cores)
    out = run_cdc(spark, n_events, n_epochs=n_epochs, mode=mode)
    out.update({"cores": cores})
    print(json.dumps(out))


def _one_cdc_subprocess(cores: int, n_events: int, n_epochs: int = CDC_EPOCHS,
                        mode: str = "cow") -> dict:
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_MASTER", None)
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__),
         "--cdc", str(n_events), "--cores", str(cores),
         "--epochs", str(n_epochs)]
        + (["--mor"] if mode == "mor" else [])
        + (["--dv"] if mode == "dv" else []),
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    if proc.returncode != 0 or not lines:
        raise RuntimeError(
            f"cdc subprocess (cores={cores}) failed rc={proc.returncode}; "
            f"stderr tail: {proc.stderr[-2000:]}"
        )
    return json.loads(lines[-1])


def main_scaling(
    small: int, large: int, n_events: int, pairs: int = 5,
    n_epochs: int = 4, mode: str = "cow",
) -> None:
    """Same job, same deterministic input, two parallelism levels.

    Each run gets a fresh JVM (local mode pins parallelism at start).
    This sandbox's host performance drifts on a minutes timescale
    (identical runs vary up to 3x), so single-shot wall-clock
    comparison is meaningless. Protocol: ``pairs`` alternating
    back-to-back (small, large) run pairs on tmpfs; adjacent runs share
    host conditions, so the per-pair throughput ratio is drift-immune;
    the reported efficiency is the MEDIAN per-pair ratio / (large/small).
    Throughput = steady-state events/s (excluding the JVM-warmup epoch).
    """
    if "SPARK_GRAFT_BENCH_DIR" not in os.environ and os.path.isdir("/dev/shm"):
        bench_dir = "/dev/shm/hdbf_bench"
        os.makedirs(bench_dir, exist_ok=True)
        os.environ["SPARK_GRAFT_BENCH_DIR"] = bench_dir
    runs: dict[int, list[dict]] = {small: [], large: []}
    ratios: list[float] = []
    for r in range(pairs):
        order = (small, large) if r % 2 == 0 else (large, small)
        pair_res = {}
        for cores in order:
            subprocess.run(["sync"], check=False)
            time.sleep(2)
            res = _one_cdc_subprocess(cores, n_events, n_epochs=n_epochs,
                                      mode=mode)
            runs[cores].append(res)
            pair_res[cores] = res
            print(f"# pair {r} local[{cores}]: steady "
                  f"{res['steady_events_per_sec']:.0f} events/s "
                  f"(total {res['seconds']:.1f}s)", file=sys.stderr)
        ratio = (pair_res[large]["steady_events_per_sec"]
                 / pair_res[small]["steady_events_per_sec"])
        ratios.append(ratio)
        print(f"# pair {r} speedup {small}->{large}: {ratio:.2f}x",
              file=sys.stderr)

    ratios_sorted = sorted(ratios)
    med_ratio = ratios_sorted[len(ratios_sorted) // 2]
    best = {
        c: max(rs, key=lambda x: x["steady_events_per_sec"])
        for c, rs in runs.items()
    }
    print(json.dumps({
        "metric": "cdc_scaling_efficiency",
        "value": round(med_ratio / (large / small), 3),
        "unit": "ratio",
        "mode": mode,
        "n_events": n_events,
        "small_cores": small,
        "large_cores": large,
        "median_pair_speedup": round(med_ratio, 3),
        "pair_speedups": [round(x, 3) for x in ratios],
        "best_small": best[small],
        "best_large": best[large],
        "all_runs": {str(c): rs for c, rs in runs.items()},
    }))


# 100x hotter than the default profile (hot 30% of events over 3
# conversations): 90% of events hammer ONE conversation restricted to
# 5 turn keys — ~n_events/2 change events landing on 5 of ~10^4 keys
SKEW_FEED = {"hot_fraction": 0.9, "n_hot": 1, "max_turns": 5}


def main_skew(cores: int, n_events: int, pairs: int = 2,
              n_epochs: int = 4) -> None:
    """North-rule skew evidence: the MERGE pipeline's throughput under
    a 100x-hotter key distribution, measured (not argued). The LWW
    dedup is a hash aggregation with map-side partial aggregation
    (lake/table.py:merge), so a hot key collapses inside each map task
    before the shuffle — the claim is throughput_skew ~= throughput
    _normal, reported as alternating same-host pairs (drift-immune)."""
    if "SPARK_GRAFT_BENCH_DIR" not in os.environ and os.path.isdir("/dev/shm"):
        d = "/dev/shm/hdbf_bench"
        os.makedirs(d, exist_ok=True)
        os.environ["SPARK_GRAFT_BENCH_DIR"] = d
    spark = _get_spark(cores)
    run_cdc(spark, min(n_events, 200_000), n_epochs=2)  # JVM warmup
    norm, skew = [], []
    for r in range(pairs):
        order = ("normal", "skew") if r % 2 == 0 else ("skew", "normal")
        for kind in order:
            res = run_cdc(
                spark, n_events, n_epochs=n_epochs,
                feed_kwargs=SKEW_FEED if kind == "skew" else None,
            )
            (skew if kind == "skew" else norm).append(
                res["steady_events_per_sec"]
            )
            print(f"# pair {r} {kind}: {res['steady_events_per_sec']:.0f} "
                  f"ev/s (rows {res['final_rows']})", file=sys.stderr)
    ratios = sorted(s / n for s, n in zip(skew, norm))
    print(json.dumps({
        "metric": "cdc_skew_throughput_ratio",
        "value": round(ratios[len(ratios) // 2], 3),
        "unit": "ratio",
        "n_events": n_events,
        "cores": cores,
        "skew_profile": SKEW_FEED,
        "normal_events_per_sec": norm,
        "skew_events_per_sec": skew,
    }))


def main_index_cost(cores: int, n_events: int, pairs: int = 2,
                    n_epochs: int = 4, kind: str = "dedup") -> None:
    """Marginal cost of maintaining a derived index inside the
    per-epoch transaction: ``kind="dedup"`` = the near-dup signature
    index (cdc_ingest --dedup-index-root), ``kind="term"`` = the
    inverted postings index (--term-index-root; fan-out is ~terms/turn
    rows per event, so expect a larger tax). Alternating same-session
    rounds of state-only vs index-CoW vs index-MoR on the same
    deterministic feed (drift-immune ratios; MoR legs charge their
    compactions inside the window)."""
    if "SPARK_GRAFT_BENCH_DIR" not in os.environ and os.path.isdir("/dev/shm"):
        d = "/dev/shm/hdbf_bench"
        os.makedirs(d, exist_ok=True)
        os.environ["SPARK_GRAFT_BENCH_DIR"] = d
    spark = _get_spark(cores)
    # warm up THROUGH the index leg: the txn/index code paths carry
    # their own first-use JIT, which would otherwise land entirely on
    # round 0's first index run
    kw = "index" if kind == "dedup" else "term_index"
    run_cdc(spark, min(n_events, 200_000), n_epochs=2, **{kw: "cow"})
    legs = [None, "cow", "mor"]
    res: dict[str, list[float]] = {"state": [], "cow": [], "mor": []}
    for r in range(pairs):
        order = legs[r % 3:] + legs[:r % 3]  # rotate per round
        for leg in order:
            out = run_cdc(spark, n_events, n_epochs=n_epochs, **{kw: leg})
            name = leg or "state"
            res[name].append(out["steady_events_per_sec"])
            print(f"# round {r} {name}: "
                  f"{out['steady_events_per_sec']:.0f} ev/s "
                  f"(load1 {out['host_load1']})", file=sys.stderr)
    med = {k: sorted(v)[len(v) // 2] for k, v in res.items()}
    print(json.dumps({
        "metric": f"{kind}_index_marginal_cost",
        "value": round(med["cow"] / med["state"], 3),
        "unit": "ratio (index-cow vs state-only steady ev/s)",
        "mor_ratio": round(med["mor"] / med["state"], 3),
        "n_events": n_events,
        "n_epochs": n_epochs,
        "cores": cores,
        "median_steady_events_per_sec": med,
        "all_runs": res,
    }))


def main_agg_view_cost(cores: int, n_events: int, pairs: int = 2,
                       n_epochs: int = 4) -> None:
    """Marginal cost of the ASYNC incremental aggregate view leg
    (cdc_ingest --agg-view-root): alternating state-only vs
    state+agg-view rounds on the same deterministic feed. The view is
    rollup-shaped (per-role first/last ts + max turn), so each epoch's
    sync is one bucket-pruned CDF read + one tiny merge — the tax
    should be small and flat in epoch size."""
    if "SPARK_GRAFT_BENCH_DIR" not in os.environ and os.path.isdir("/dev/shm"):
        d = "/dev/shm/hdbf_bench"
        os.makedirs(d, exist_ok=True)
        os.environ["SPARK_GRAFT_BENCH_DIR"] = d
    spark = _get_spark(cores)
    run_cdc(spark, min(n_events, 200_000), n_epochs=2, agg_view=True)
    legs = [("state", 0), ("every1", 1), ("amortized", n_epochs)]
    res: dict[str, list[float]] = {n: [] for n, _ in legs}
    for r in range(pairs):
        order = legs[r % 3:] + legs[:r % 3]
        for name, every in order:
            out = run_cdc(spark, n_events, n_epochs=n_epochs,
                          agg_view=every > 0,
                          agg_view_every=max(every, 1))
            res[name].append(out["steady_events_per_sec"])
            print(f"# round {r} {name}: "
                  f"{out['steady_events_per_sec']:.0f} ev/s "
                  f"(load1 {out['host_load1']})", file=sys.stderr)
    med = {k: sorted(v)[len(v) // 2] for k, v in res.items()}
    print(json.dumps({
        "metric": "agg_view_marginal_cost",
        "value": round(med["every1"] / med["state"], 3),
        "unit": "ratio (state+agg-view-per-epoch vs state-only "
                "steady ev/s)",
        "amortized_ratio": round(med["amortized"] / med["state"], 3),
        "amortized_every": n_epochs,
        "n_events": n_events,
        "n_epochs": n_epochs,
        "cores": cores,
        "median_steady_events_per_sec": med,
        "all_runs": res,
    }))


def main_dv_cost(cores: int, n_rows: int, pairs: int = 2,
                 every: int = 97) -> None:
    """Delete-mode cost triangle: CoW (rewrite matched files) vs MoR
    (full-row tombstone deltas) vs DV (position-delete vectors) for a
    scattered DELETE of ~1/``every`` of a wide-row table — the
    delete-heavy CDC shape (GDPR erasure, retention sweeps). Each leg
    runs on a fresh SHALLOW CLONE of one base lake (zero-copy, its
    writes land under the clone root), so legs are byte-identical and
    alternating rounds cancel host drift. Reports per-leg median
    delete seconds, MB written by the delete, and the post-delete
    full-read seconds (MoR pays the collapse, DV the anti-join, CoW
    nothing)."""
    import uuid as _uuid

    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    from haskell_dbfunctor_spark.lake.table import LakeTable

    if "SPARK_GRAFT_BENCH_DIR" not in os.environ and os.path.isdir("/dev/shm"):
        d = "/dev/shm/hdbf_bench"
        os.makedirs(d, exist_ok=True)
        os.environ["SPARK_GRAFT_BENCH_DIR"] = d
    spark = _get_spark(cores)
    root = os.path.join(
        os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp"),
        f"hdbf_dvcost_{_uuid.uuid4().hex[:6]}",
    )
    schema = T.StructType([
        T.StructField("k", T.LongType(), False),
        T.StructField("grp", T.StringType(), True),
        T.StructField("val", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
    ])
    # ~270-byte rows: the wide-transcript shape where DV's no-payload
    # writes should win hardest
    df = spark.range(n_rows).select(
        F.col("id").alias("k"),
        F.pmod(F.col("id"), F.lit(11)).cast("string").alias("grp"),
        F.pmod(F.col("id") * 31, F.lit(1000)).alias("val"),
        F.concat(*[
            F.sha2(F.concat(F.col("id").cast("string"), F.lit(s)), 256)
            for s in ("a", "b", "c", "d")
        ]).alias("text"),
        F.lit("U").alias("op"),
        F.col("id").alias("seq"),
    )
    base = LakeTable.create(
        spark, f"{root}/base", schema, key_cols=["k"], num_buckets=32
    )
    base.merge(df, epoch_id="seed", order_cols=("seq",),
               drop_cols=("seq",), prune_buckets=False)
    pred = f"val % {every} = 0"

    def _tree_mb(p: str) -> float:
        total = 0
        for dp, _, fns in os.walk(os.path.join(p, "data")):
            for fn in fns:
                try:
                    total += os.path.getsize(os.path.join(dp, fn))
                except OSError:
                    pass
        return total / 1e6

    legs = ["cow", "mor", "dv"]
    res = {m: {"delete_s": [], "mb_written": [], "read_s": [],
               "n_deleted": 0} for m in legs}
    # warm the JVM through all three paths once (JIT/codegen)
    for m in legs:
        c = base.shallow_clone(f"{root}/warm_{m}")
        c.delete_where(pred + " and k < 1000", mode=m)
        c.read().count()
        shutil.rmtree(f"{root}/warm_{m}", ignore_errors=True)
    for r in range(pairs):
        order = legs[r % 3:] + legs[:r % 3]
        for m in order:
            croot = f"{root}/c_{m}_{r}"
            c = base.shallow_clone(croot)
            t0 = time.time()
            stats = c.delete_where(pred, mode=m)
            del_s = time.time() - t0
            mb = _tree_mb(croot)
            t0 = time.time()
            n_after = c.read().count()
            read_s = time.time() - t0
            res[m]["delete_s"].append(del_s)
            res[m]["mb_written"].append(mb)
            res[m]["read_s"].append(read_s)
            res[m]["n_deleted"] = stats.n_deleted
            print(f"# round {r} {m}: delete {del_s:.2f}s, "
                  f"{mb:.1f} MB written, read {read_s:.2f}s "
                  f"(rows after {n_after})", file=sys.stderr)
            shutil.rmtree(croot, ignore_errors=True)
    med = {
        m: {k: round(sorted(v)[len(v) // 2], 3)
            for k, v in vals.items() if isinstance(v, list)}
        for m, vals in res.items()
    }
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({
        "metric": "dv_delete_speedup_vs_cow",
        "value": round(med["cow"]["delete_s"] / med["dv"]["delete_s"], 3),
        "unit": "ratio (CoW delete s / DV delete s, median)",
        "n_rows": n_rows,
        "deleted_rows": res["dv"]["n_deleted"],
        "cores": cores,
        "medians": med,
    }))


def main_codec_cost(cores: int, n_rows: int, pairs: int = 2) -> None:
    """write.compression-codec trade: snappy (default) vs zstd on the
    wide-transcript row shape — per-leg median ingest-merge seconds,
    live table MB, and full-scan + hash-agg read seconds. At the
    100 TB target the zstd leg's smaller files buy cheaper scans and
    less shuffle-read I/O for higher write CPU; this measures both
    sides on this host. Legs alternate per round to cancel drift."""
    import uuid as _uuid

    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    from haskell_dbfunctor_spark.lake.table import LakeTable

    if "SPARK_GRAFT_BENCH_DIR" not in os.environ and os.path.isdir("/dev/shm"):
        d = "/dev/shm/hdbf_bench"
        os.makedirs(d, exist_ok=True)
        os.environ["SPARK_GRAFT_BENCH_DIR"] = d
    spark = _get_spark(cores)
    root = os.path.join(
        os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp"),
        f"hdbf_codec_{_uuid.uuid4().hex[:6]}",
    )
    schema = T.StructType([
        T.StructField("k", T.LongType(), False),
        T.StructField("grp", T.StringType(), True),
        T.StructField("val", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
    ])
    df = spark.range(n_rows).select(
        F.col("id").alias("k"),
        F.pmod(F.col("id"), F.lit(11)).cast("string").alias("grp"),
        F.pmod(F.col("id") * 31, F.lit(1000)).alias("val"),
        F.concat(*[
            F.sha2(F.concat(F.col("id").cast("string"), F.lit(s)), 256)
            for s in ("a", "b", "c", "d")
        ]).alias("text"),
        F.lit("U").alias("op"),
        F.col("id").alias("seq"),
    )
    df.count()  # warm the range/codegen path outside the timed legs
    legs = ["snappy", "zstd"]
    res = {m: {"ingest_s": [], "live_mb": [], "scan_s": [], "agg_s": []}
           for m in legs}
    for r in range(pairs):
        order = legs if r % 2 == 0 else legs[::-1]
        for m in order:
            troot = f"{root}/t_{m}_{r}"
            t = LakeTable.create(
                spark, troot, schema, key_cols=["k"], num_buckets=32,
                properties={"write.compression-codec": m},
            )
            t0 = time.time()
            t.merge(df, epoch_id="seed", order_cols=("seq",),
                    drop_cols=("seq",), prune_buckets=False)
            ingest_s = time.time() - t0
            mb = sum(os.path.getsize(f) for f in t._files()) / 1e6
            t0 = time.time()
            t.read().count()
            scan_s = time.time() - t0
            t0 = time.time()
            t.read().groupBy("grp").agg(
                F.sum("val"), F.max("text")).collect()
            agg_s = time.time() - t0
            res[m]["ingest_s"].append(ingest_s)
            res[m]["live_mb"].append(mb)
            res[m]["scan_s"].append(scan_s)
            res[m]["agg_s"].append(agg_s)
            print(f"# round {r} {m}: ingest {ingest_s:.2f}s, "
                  f"{mb:.1f} MB live, scan {scan_s:.2f}s, agg "
                  f"{agg_s:.2f}s", file=sys.stderr)
            shutil.rmtree(troot, ignore_errors=True)
    med = {
        m: {k: round(sorted(v)[len(v) // 2], 3) for k, v in vals.items()}
        for m, vals in res.items()
    }
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({
        "metric": "codec_zstd_bytes_ratio",
        "value": round(med["snappy"]["live_mb"] / med["zstd"]["live_mb"], 3),
        "unit": "ratio (snappy live MB / zstd live MB, median)",
        "ingest_ratio_zstd_vs_snappy": round(
            med["zstd"]["ingest_s"] / med["snappy"]["ingest_s"], 3),
        "scan_ratio_zstd_vs_snappy": round(
            med["zstd"]["scan_s"] / med["snappy"]["scan_s"], 3),
        "n_rows": n_rows,
        "cores": cores,
        "medians": med,
    }))


def main_trickle_cost(cores: int, n_rows: int, pairs: int = 2,
                      n_batches: int = 10, batch_rows: int = 2000) -> None:
    """Trickle-update merge cost: plain CoW (every touched bucket
    rewrites whole) vs file-pruned CoW on two layouts — range-clustered
    (min/max stats carry key-disjoint files) and hash-subsplit
    (per-file key Blooms carry files whose filter rejects every batch
    key). The workload is the append-mostly WAL shape: each batch is
    90% inserts of NEW keys interleaved within the existing keyspace
    (odd keys between the seeded evens — range stats alone can't prove
    them absent on the unclustered layout, Blooms can) + 10% updates
    of recently-inserted entities (evens in the same key window), so
    some rewrite is always legitimate while the batch's per-bucket
    [lo, hi] bounds stay narrow (scattering updates across the whole
    keyspace would widen the bounds and honestly defeat range pruning
    — that spread-update shape is the Bloom leg's job). Legs are three
    persistent tables (shallow clones drop the stats/bloom catalogs by
    design); rounds advance the key window so every batch stays
    append-mostly, alternating leg order to cancel host drift.
    Trickle-written files get min/max stats at write time
    (stats.auto-columns), so later disjoint windows range-carry them
    on BOTH pruned legs — only the seed files need the
    layout-appropriate catalog."""
    import uuid as _uuid

    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    from haskell_dbfunctor_spark.lake.table import LakeTable

    if "SPARK_GRAFT_BENCH_DIR" not in os.environ and os.path.isdir("/dev/shm"):
        d = "/dev/shm/hdbf_bench"
        os.makedirs(d, exist_ok=True)
        os.environ["SPARK_GRAFT_BENCH_DIR"] = d
    spark = _get_spark(cores)
    root = os.path.join(
        os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp"),
        f"hdbf_trickle_{_uuid.uuid4().hex[:6]}",
    )
    schema = T.StructType([
        T.StructField("k", T.LongType(), False),
        T.StructField("grp", T.StringType(), True),
        T.StructField("val", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
    ])

    def _rows_df(ids, tag):
        # wide ~270-byte rows (the transcript shape); even keys seed,
        # odd keys are the insert stream
        return ids.select(
            F.col("k"),
            F.pmod(F.col("k"), F.lit(11)).cast("string").alias("grp"),
            F.pmod(F.col("k") * 31, F.lit(1000)).alias("val"),
            F.concat(*[
                F.sha2(F.concat(F.col("k").cast("string"), F.lit(s)), 256)
                for s in ("a", "b", "c", "d")
            ]).alias("text"),
            F.lit("U").alias("op"),
            (F.col("k") + F.lit(tag)).alias("seq"),
        )

    # blooms-on-write keeps the membership filters alive across
    # rewrites (without it, pruning decays after each bucket's first
    # legitimate fold). A file is carried only when the bloom rejects
    # EVERY batch key of its bucket; the default bloom.bits-per-row=16
    # sizes each file's filter to its row count (FPR ~0.2% at any
    # size), so consolidated files keep pruning as they grow
    base = LakeTable.create(
        spark, f"{root}/base", schema, key_cols=["k"], num_buckets=32,
        properties={"stats.auto-columns": "k",
                    "bloom.auto-columns": "k"},
    )
    # prune_buckets=True at seed so the write-task sizing sees the
    # dedup count (an empty table has no byte estimate) and the 2 MB
    # target actually subsplits each bucket into ~8 hash files
    base.merge(
        _rows_df(spark.range(n_rows).select((F.col("id") * 2).alias("k")), 0),
        epoch_id="seed", order_cols=("seq",), drop_cols=("seq",),
        files_per_bucket=8, target_file_bytes=2 << 20,
    )
    # range-clustered sibling layout for the stats leg (~2 MB files);
    # range-disjoint files don't need membership filters — drop the
    # bloom property so this leg isolates the stats path (and doesn't
    # pay the write-time bloom pass)
    clustered = base.shallow_clone(f"{root}/clustered")
    clustered.set_properties({"bloom.auto-columns": None})
    clustered.compact(sort_by="k", target_file_bytes=2 << 20)

    def _batch(g: int):
        # window g: 98% odd-key inserts + 2% same-window even-key
        # updates — a narrow per-bucket key range (the "recent
        # entities get edited" shape). More scattered updates would
        # legitimately touch ~every subsplit file (each holds a hash
        # sample of the keyspace), which is a full-rewrite workload,
        # not a trickle.
        n_upd = max(batch_rows * 2 // 100, 1)
        ins = spark.range(batch_rows - n_upd).select(
            (F.lit(g * batch_rows) + F.col("id")).alias("j")
        ).select((F.col("j") * 2 + 1).alias("k"))
        upd = spark.range(n_upd).select(
            ((F.lit(g * batch_rows) + F.col("id") * 45) * 2).alias("k")
        )
        return _rows_df(ins.unionByName(upd), n_rows * 2 + g + 1)

    def _tree_mb(p: str) -> float:
        total = 0
        for dp, _, fns in os.walk(os.path.join(p, "data")):
            for fn in fns:
                try:
                    total += os.path.getsize(os.path.join(dp, fn))
                except OSError:
                    pass
        return total / 1e6

    # persistent leg tables: shallow clones drop the stats/bloom
    # catalogs (documented), so pruned legs must own real tables.
    # The plain leg never prunes — strip the bloom property so it
    # doesn't pay the write-time indexing it would never use.
    plain = base.shallow_clone(f"{root}/plain")
    plain.set_properties({"bloom.auto-columns": None})
    # dv leg: deletion-vector MERGE — O(batch) writes regardless of
    # update scatter (vectors matched positions, appends new images).
    # Production config composes it with bloom file skipping so the
    # match SCAN also shrinks: re-index the clone's referenced files
    # (clones drop the catalogs) and keep blooms-on-write for appends.
    dv = base.shallow_clone(f"{root}/dvleg")
    dv.analyze_bloom(["k"], bits=1 << 17, k=4)
    legs = {
        "plain": (plain, False, "cow"),
        "bloom": (base, True, "cow"),
        "stats": (clustered, True, "cow"),
        "dv": (dv, True, "dv"),
    }
    res = {m: {"merge_s": [], "mb_written": [], "files_carried": []}
           for m in legs}
    names = list(legs)
    g = 0
    # one warm pass through each leg (JIT/codegen), advancing windows
    for m, (t, prune, mmode) in legs.items():
        b = _batch(g).persist()
        b.count()
        t.merge(b, epoch_id=f"w{g}", order_cols=("seq",),
                drop_cols=("seq",), prune_files=prune, mode=mmode)
        b.unpersist()
        g += 1
    for r in range(pairs):
        order = names[r % len(names):] + names[:r % len(names)]
        for m in order:
            t, prune, mmode = legs[m]
            batches = [_batch(g + i).persist() for i in range(n_batches)]
            for b in batches:
                b.count()
            g += n_batches
            carried = 0
            mb0 = _tree_mb(t.root)
            t0 = time.time()
            for i, b in enumerate(batches):
                st = t.merge(b, epoch_id=f"t{g}-{i}", order_cols=("seq",),
                             drop_cols=("seq",), prune_files=prune,
                             mode=mmode)
                carried += st.extra.get("files_carried", 0) + \
                    st.extra.get("files_skipped", 0)
            total_s = time.time() - t0
            mb = _tree_mb(t.root) - mb0
            for b in batches:
                b.unpersist()
            res[m]["merge_s"].append(total_s / n_batches)
            res[m]["mb_written"].append(mb)
            res[m]["files_carried"].append(carried)
            print(f"# round {r} {m}: {total_s / n_batches:.2f}s/merge, "
                  f"{mb:.1f} MB written, {carried} files carried",
                  file=sys.stderr)
    med = {
        m: {k: round(sorted(v)[len(v) // 2], 3) for k, v in vals.items()}
        for m, vals in res.items()
    }
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({
        "metric": "trickle_prune_speedup_vs_plain",
        "value": round(med["plain"]["merge_s"] / med["stats"]["merge_s"], 3),
        "unit": "ratio (plain CoW merge s / stats-pruned clustered merge "
                "s, median)",
        # the hash-layout Bloom leg decays under even 2% scattered
        # updates: every rewrite consolidates the bucket's rows into a
        # growing file that the next batch's updates almost surely hit
        # — membership pruning is an insert-heavy tool; scattered
        # updates on unclustered layouts want MoR/DV writes instead
        "bloom_leg_ratio": round(
            med["plain"]["merge_s"] / med["bloom"]["merge_s"], 3),
        # deletion-vector MERGE: O(batch) writes at any update scatter
        "dv_leg_ratio": round(
            med["plain"]["merge_s"] / med["dv"]["merge_s"], 3),
        "n_rows": n_rows, "n_batches": n_batches,
        "batch_rows": batch_rows, "cores": cores,
        "medians": med,
    }))


def main_rescale_cost(cores: int, n_rows: int, n_batches: int = 6,
                      batch_rows: int = 8) -> None:
    """Bucket-spec evolution cost: full ``rebucket(256)`` (one blocking
    O(table) rewrite) vs ``rebucket(256, lazy=True)`` (metadata-only
    declaration + progressive migration). The lazy path never avoids
    the total rewrite bytes — it removes the STOP-THE-WORLD: the
    declaration is O(1), trickle merges fold only the legacy buckets
    their keys hash to, budgeted ``migrate_legacy(max_buckets=K)``
    slices are each small, snapshot-isolated, resumable commits that
    readers and writers overlap freely. Reported accordingly: declare
    latency, per-merge overhead during migration vs a no-rescale
    control, total migration wall time, and the MAX single-commit
    seconds on each path (the availability number that matters at
    100 TB — a 4096-bucket fold sliced 64-at-a-time never holds the
    table hostage; the full rebucket does)."""
    import uuid as _uuid

    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    from haskell_dbfunctor_spark.lake.table import LakeTable

    if "SPARK_GRAFT_BENCH_DIR" not in os.environ and os.path.isdir("/dev/shm"):
        d = "/dev/shm/hdbf_bench"
        os.makedirs(d, exist_ok=True)
        os.environ["SPARK_GRAFT_BENCH_DIR"] = d
    spark = _get_spark(cores)
    root = os.path.join(
        os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp"),
        f"hdbf_rescale_{_uuid.uuid4().hex[:6]}",
    )
    schema = T.StructType([
        T.StructField("k", T.LongType(), False),
        T.StructField("grp", T.StringType(), True),
        T.StructField("val", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
    ])

    def _rows_df(ids, tag):
        return ids.select(
            F.col("k"),
            F.pmod(F.col("k"), F.lit(11)).cast("string").alias("grp"),
            F.pmod(F.col("k") * 31, F.lit(1000)).alias("val"),
            F.concat(*[
                F.sha2(F.concat(F.col("k").cast("string"), F.lit(s)), 256)
                for s in ("a", "b", "c", "d")
            ]).alias("text"),
            F.lit("U").alias("op"),
            (F.col("k") + F.lit(tag)).alias("seq"),
        )

    def _seed(name):
        t = LakeTable.create(
            spark, f"{root}/{name}", schema, key_cols=["k"],
            num_buckets=64,
        )
        t.merge(_rows_df(spark.range(n_rows).select(F.col("id").alias("k")),
                         0),
                epoch_id="seed", order_cols=("seq",), drop_cols=("seq",))
        return t

    def _batch(g):
        # trickle point-fixes: batch_rows scattered key updates — the
        # shape where progressive folds amortize (wide epochs fold
        # everything on epoch 1, which is just the rewrite paid once)
        return _rows_df(
            spark.range(batch_rows).select(
                F.pmod(F.col("id") * 7919 + F.lit(g * 104729),
                       F.lit(n_rows)).alias("k")
            ).distinct(),
            n_rows + g + 1,
        )

    legs: dict[str, dict] = {}

    # warm pass on a scratch table: JIT/codegen/reader warmup must not
    # land on whichever leg happens to run first
    warm = _seed("warm")
    for i in range(2):
        b = _batch(i).persist(); b.count()
        warm.merge(b, epoch_id=f"w{i}", order_cols=("seq",),
                   drop_cols=("seq",))
        b.unpersist()

    # --- control: no rescale, same trickle merges
    ctrl = _seed("ctrl")
    per = []
    for i in range(n_batches):
        b = _batch(i).persist(); b.count()
        m0 = time.time()
        ctrl.merge(b, epoch_id=f"c{i}", order_cols=("seq",),
                   drop_cols=("seq",))
        per.append(time.time() - m0)
        b.unpersist()
    legs["control"] = {"merge_s_med": sorted(per)[len(per) // 2]}

    # --- full rebucket leg
    full = _seed("full")
    t0 = time.time()
    full.rebucket(256)
    full_s = time.time() - t0
    per = []
    for i in range(n_batches):
        b = _batch(i).persist(); b.count()
        m0 = time.time()
        full.merge(b, epoch_id=f"f{i}", order_cols=("seq",),
                   drop_cols=("seq",))
        per.append(time.time() - m0)
        b.unpersist()
    legs["full"] = {
        "rebucket_s": round(full_s, 3),
        "merge_s_med": sorted(per)[len(per) // 2],
        "max_commit_s": round(full_s, 3),
    }

    # --- lazy leg: declare, trickle (folds ride along), budgeted folds
    lazy = _seed("lazy")
    t0 = time.time()
    lazy.rebucket(256, lazy=True)
    declare_s = time.time() - t0
    per = []
    for i in range(n_batches):
        b = _batch(i).persist(); b.count()
        m0 = time.time()
        lazy.merge(b, epoch_id=f"l{i}", order_cols=("seq",),
                   drop_cols=("seq",))
        per.append(time.time() - m0)
        b.unpersist()
    # mid-migration read tax (overlay unioned into the scan)
    r0 = time.time(); lazy.read().count(); read_mid_s = time.time() - r0
    # budgeted slices: each fold commit is 8 of 64 legacy buckets —
    # the per-slice wall time is the longest the table is ever "busy"
    # on the lazy path (vs the full rewrite's single table-wide commit)
    mig0 = time.time()
    slice_s: list[float] = []
    while lazy.legacy_pending:
        s0 = time.time()
        lazy.migrate_legacy(max_buckets=8)
        slice_s.append(time.time() - s0)
    mig_s = time.time() - mig0
    r0 = time.time(); lazy.read().count(); read_post_s = time.time() - r0
    legs["lazy"] = {
        "declare_s": round(declare_s, 3),
        "merge_s_med": sorted(per)[len(per) // 2],
        "migrate_s_total": round(mig_s, 3),
        "migrate_slices": len(slice_s),
        "max_slice_s": round(max(slice_s), 3) if slice_s else 0.0,
        "read_mid_s": round(read_mid_s, 3),
        "read_post_s": round(read_post_s, 3),
    }
    shutil.rmtree(root, ignore_errors=True)
    for m in legs:
        if "merge_s_med" in legs[m]:
            legs[m]["merge_s_med"] = round(legs[m]["merge_s_med"], 3)
    print(json.dumps({
        "metric": "lazy_rescale_declare_speedup",
        "value": round(legs["full"]["rebucket_s"]
                       / max(legs["lazy"]["declare_s"], 1e-3), 1),
        "unit": "ratio (full rebucket s / lazy declare s)",
        "slice_vs_full_commit": round(
            legs["full"]["rebucket_s"]
            / max(legs["lazy"]["max_slice_s"], 1e-3), 2),
        "merge_overhead_during_migration": round(
            legs["lazy"]["merge_s_med"] / legs["control"]["merge_s_med"],
            2),
        "n_rows": n_rows, "n_batches": n_batches,
        "batch_rows": batch_rows, "cores": cores,
        "legs": legs,
    }))


def main_cdf_source_cost(cores: int, n_rows: int, n_commits: int = 5,
                         batch_rows: int = 2000) -> None:
    """Streaming CDF source cost: drain the same trickle-commit window
    through ``format("lake_cdf")`` (availableNow, worker-side DuckDB
    bucket diffs) vs the batch ``changes_since`` path (Spark hash-agg
    diff). Both are bucket-pruned; the stream adds checkpoint +
    micro-batch planning overhead and buys exactly-once restart and a
    push-shaped deployment. Rows/sec on the CHANGE rows is the
    comparable number — both paths read only touched buckets, so
    table size drops out of the steady-state cost."""
    import uuid as _uuid

    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    from haskell_dbfunctor_spark.lake.table import LakeTable
    from haskell_dbfunctor_spark.streaming.cdf_source import read_cdf_stream

    if "SPARK_GRAFT_BENCH_DIR" not in os.environ and os.path.isdir("/dev/shm"):
        d = "/dev/shm/hdbf_bench"
        os.makedirs(d, exist_ok=True)
        os.environ["SPARK_GRAFT_BENCH_DIR"] = d
    spark = _get_spark(cores)
    root = os.path.join(
        os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp"),
        f"hdbf_cdfsrc_{_uuid.uuid4().hex[:6]}",
    )
    schema = T.StructType([
        T.StructField("k", T.LongType(), False),
        T.StructField("grp", T.StringType(), True),
        T.StructField("val", T.LongType(), True),
    ])

    def _rows(ids, tag):
        return ids.select(
            F.col("k"),
            F.pmod(F.col("k"), F.lit(11)).cast("string").alias("grp"),
            (F.col("k") * 31 + F.lit(tag)).alias("val"),
            F.lit("U").alias("op"),
            F.lit(tag).alias("seq"),
        )

    t = LakeTable.create(spark, f"{root}/t", schema, key_cols=["k"],
                         num_buckets=64)
    t.merge(_rows(spark.range(n_rows).select(F.col("id").alias("k")), 0),
            epoch_id="seed", order_cols=("seq",), drop_cols=("seq",))
    v0 = t.version
    for i in range(n_commits):
        upd = spark.range(batch_rows).select(
            F.pmod(F.col("id") * 7919 + F.lit(i * 104729),
                   F.lit(n_rows)).alias("k")
        ).distinct()
        t.merge(_rows(upd, i + 1), epoch_id=f"c{i}",
                order_cols=("seq",), drop_cols=("seq",))

    # batch path: per-commit feed, collected to parquet like a consumer
    b0 = time.time()
    batch_rows_out = t.changes_since(v0).count()
    batch_s = time.time() - b0

    # stream path: one availableNow drain over the same window
    df = read_cdf_stream(spark, t.root, starting_version=v0)
    out, ckpt = f"{root}/out", f"{root}/ckpt"
    s0 = time.time()
    q = (df.writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(600)
    stream_s = time.time() - s0
    stream_rows = spark.read.parquet(out).count()

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({
        "metric": "cdf_stream_vs_batch_ratio",
        "value": round(stream_s / max(batch_s, 1e-3), 2),
        "unit": "ratio (stream drain s / batch changes_since s, same "
                "window; stream rows are the NET diff)",
        "stream_s": round(stream_s, 3), "batch_s": round(batch_s, 3),
        "stream_rows": stream_rows, "batch_rows": batch_rows_out,
        "n_rows": n_rows, "n_commits": n_commits,
        "commit_rows": batch_rows, "cores": cores,
    }))


def main_sink_cost(cores: int, n_events: int, n_epochs: int = 4) -> None:
    """format("lake") streaming-sink ingest vs the replay MoR merge
    path on the SAME deterministic feed, one commit per epoch. The
    sink stages Arrow batches executor-side (per-bucket parquet via
    pyarrow + in-task DuckDB LWW dedup) and CAS-registers them in a
    Spark-less commit worker; the merge path is the JVM hash-agg
    dedup + partitionBy delta write. Both end states must be
    row-identical (asserted). The sink charges a full streaming-query
    start/stop per epoch (the availableNow cron deployment shape)."""
    import uuid as _uuid

    from pyspark.sql import functions as F

    from haskell_dbfunctor_spark.cdc.apply import replay
    from haskell_dbfunctor_spark.cdc.generator import (
        KEY_COLS, TRANSCRIPT_SCHEMA, change_feed,
    )
    from haskell_dbfunctor_spark.lake.table import LakeTable
    from haskell_dbfunctor_spark.streaming.lake_sink import (
        prepare_sink_frame, write_lake_stream,
    )

    if "SPARK_GRAFT_BENCH_DIR" not in os.environ and os.path.isdir("/dev/shm"):
        d = "/dev/shm/hdbf_bench"
        os.makedirs(d, exist_ok=True)
        os.environ["SPARK_GRAFT_BENCH_DIR"] = d
    spark = _get_spark(cores)
    root = os.path.join(
        os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp"),
        f"hdbf_sink_{_uuid.uuid4().hex[:6]}",
    )
    try:
        feed_path = os.path.join(root, "_feed")
        change_feed(
            spark, n_events, n_convs=max(n_events // 200, 100),
            n_epochs=n_epochs,
        ).write.partitionBy("epoch").parquet(feed_path)
        feed = spark.read.parquet(feed_path)
        ep_schema = feed.drop("epoch").schema

        # ---- merge reference leg. Both tables carry the FULL schema
        # (incl. tool) from creation: the sink contract forbids
        # mid-stream evolution, so the comparison holds it fixed
        t_mor = LakeTable.create(
            spark, os.path.join(root, "mor"), TRANSCRIPT_SCHEMA,
            key_cols=KEY_COLS, num_buckets=64,
        )
        m0 = time.time()
        replay(t_mor, feed, n_epochs, mode="mor")
        mor_s = time.time() - m0

        # ---- streaming sink leg: one availableNow drain per epoch
        t_sink = LakeTable.create(
            spark, os.path.join(root, "sink"), TRANSCRIPT_SCHEMA,
            key_cols=KEY_COLS, num_buckets=64,
        )
        s0 = time.time()
        for i in range(n_epochs):
            src = spark.readStream.schema(ep_schema).parquet(
                os.path.join(feed_path, f"epoch={i}")
            )
            q = write_lake_stream(
                prepare_sink_frame(
                    t_sink, src, op_col="op", carry=("seq",), width=cores
                ),
                t_sink.root,
                checkpoint=os.path.join(root, f"ck{i}"),
                dedup="lww", order_cols="ts,seq",
                epoch_prefix=f"sink-e{i}",
                trigger={"availableNow": True},
            )
            q.awaitTermination(600)
        sink_s = time.time() - s0

        t_sink = LakeTable.load(spark, t_sink.root)
        diff = (
            t_mor.read().exceptAll(t_sink.read()).count()
            + t_sink.read().exceptAll(t_mor.read()).count()
        )
        rows = t_mor.read().count()
        print(json.dumps({
            "metric": "sink_vs_merge_ratio",
            "value": round(sink_s / max(mor_s, 1e-3), 2),
            "unit": "ratio (stream-sink s / MoR merge s, same feed; "
                    "<1 = sink faster)",
            "sink_events_per_sec": round(n_events / sink_s, 1),
            "merge_events_per_sec": round(n_events / mor_s, 1),
            "sink_s": round(sink_s, 3), "merge_s": round(mor_s, 3),
            "state_rows": rows, "state_diff_rows": diff,
            "n_events": n_events, "n_epochs": n_epochs, "cores": cores,
        }))
        assert diff == 0, "sink state diverged from merge state"
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main_pq_cost(cores: int, n_vecs: int, pairs: int = 3,
                 m: int = 4, n_codes: int = 16, dims: int = 64) -> None:
    """Compressed-ANN scan cost: the phase that must touch EVERY row —
    exact cosine over the full float-vector column vs PQ ADC over the
    m-tinyint code column (one literal LUT per sub-space) — on the
    same synthetic corpus written to parquet once. Also reports the
    on-disk bytes of each layout (the 100 TB claim IS the byte ratio:
    random floats are incompressible, codes are m bytes/row). The
    shortlist re-rank is excluded from both legs deliberately — it
    touches O(shortlist) rows by key at any scale, never the corpus.
    Legs alternate per round to cancel host drift."""
    import uuid as _uuid

    from pyspark.sql import functions as F

    from haskell_dbfunctor_spark.pipelines.pq import pq_train
    from haskell_dbfunctor_spark.pipelines.pq_index import code_assign_col

    if "SPARK_GRAFT_BENCH_DIR" not in os.environ and os.path.isdir("/dev/shm"):
        d = "/dev/shm/hdbf_bench"
        os.makedirs(d, exist_ok=True)
        os.environ["SPARK_GRAFT_BENCH_DIR"] = d
    spark = _get_spark(cores)
    root = os.path.join(
        os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp"),
        f"hdbf_pqcost_{_uuid.uuid4().hex[:6]}",
    )
    d_sub = dims // m
    # deterministic pseudo-random floats in [-1, 1): JVM-generated,
    # incompressible (the honest worst case for the float layout)
    emb_col = F.array(*[
        ((F.pmod(F.xxhash64(F.col("id"), F.lit(i)), F.lit(20000))
          / 10000.0) - 1.0).cast("float")
        for i in range(dims)
    ])
    spark.range(n_vecs).select(
        F.col("id").alias("vec_id"), emb_col.alias("embedding")
    ).write.mode("overwrite").parquet(f"{root}/vec")
    vec = spark.read.parquet(f"{root}/vec")
    cb_rows = sorted(
        (int(r["sub"]), int(r["code"]), [float(x) for x in r["cv"]])
        for r in pq_train(
            vec.where(F.col("vec_id") < 20000), m, n_codes, 1, dims
        ).collect()
    )
    # dense-remap seed-id codes to 0..n_codes-1 per sub so the stored
    # column is genuinely m tinyints and the LUT is element_at-able
    dense = {}
    luts = [[0.0] * n_codes for _ in range(m)]
    qv = vec.where(F.col("vec_id") == 0).head()["embedding"]
    per_sub: dict[int, list] = {}
    for sub, code, cv in cb_rows:
        per_sub.setdefault(sub, []).append((code, cv))
    for sub, entries in per_sub.items():
        for j, (code, cv) in enumerate(sorted(entries)):
            dense[(sub, code)] = j
            luts[sub][j] = round(sum(
                (float(qv[sub * d_sub + i]) - cv[i]) ** 2
                for i in range(d_sub)
            ), 6)
    raw = code_assign_col(F.col("embedding"), cb_rows, m=m, dims=dims)
    remap = F.create_map(*[
        x for (sub, code), j in sorted(dense.items())
        for x in (F.lit(sub * 1000 + code), F.lit(j))
    ])
    vec.select(
        "vec_id",
        *[
            remap[F.lit(s * 1000) + F.element_at(raw, s + 1)]
            .cast("tinyint").alias(f"c{s}")
            for s in range(m)
        ],
    ).write.mode("overwrite").parquet(f"{root}/codes")
    codes = spark.read.parquet(f"{root}/codes")

    def _tree_mb(p: str) -> float:
        total = 0
        for dirpath, _, files in os.walk(p):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(dirpath, f))
                except OSError:
                    pass
        return total / 1e6

    def exact_leg() -> float:
        qlit = F.lit([float(x) for x in qv])
        dot = F.aggregate(
            F.zip_with(F.col("embedding"), qlit,
                       lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda a, v: a + v,
        )
        nrm = F.sqrt(F.aggregate(
            F.transform(F.col("embedding"),
                        lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0), lambda a, v: a + v,
        ))
        t0 = time.time()
        (vec.where(F.col("vec_id") != 0)
            .select("vec_id", (dot / nrm).alias("s"))
            .orderBy(F.col("s").desc(), F.col("vec_id"))
            .limit(10).collect())
        return time.time() - t0

    def adc_leg() -> float:
        adc = sum(
            F.element_at(F.lit(luts[s]), F.col(f"c{s}").cast("int") + 1)
            for s in range(m)
        )
        t0 = time.time()
        (codes.where(F.col("vec_id") != 0)
            .select("vec_id", adc.alias("adc"))
            .orderBy(F.col("adc").asc(), F.col("vec_id"))
            .limit(50).collect())
        return time.time() - t0

    exact_leg(); adc_leg()  # warm codegen/readers outside the timing
    res = {"exact_s": [], "adc_s": []}
    for r in range(pairs):
        for name, leg in (("exact_s", exact_leg), ("adc_s", adc_leg)):
            s = leg()
            res[name].append(s)
            print(f"# round {r} {name}: {s:.3f}s", file=sys.stderr)
    med = {k: round(sorted(v)[len(v) // 2], 3) for k, v in res.items()}
    vec_mb, code_mb = _tree_mb(f"{root}/vec"), _tree_mb(f"{root}/codes")
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({
        "metric": "pq_adc_scan_speedup_vs_exact",
        "value": round(med["exact_s"] / med["adc_s"], 3),
        "unit": "ratio (exact cosine scan s / ADC code scan s, median)",
        "n_vecs": n_vecs,
        "dims": dims,
        "m": m,
        "n_codes": n_codes,
        "cores": cores,
        "medians": med,
        "vector_mb": round(vec_mb, 1),
        "code_mb": round(code_mb, 1),
        "byte_ratio": round(vec_mb / max(code_mb, 1e-9), 1),
    }))


def main_prefix_cost(cores: int, n_docs: int = 10_000, pairs: int = 3,
                     threshold: float = 0.8) -> None:
    """Exact near-dup: prefix filter (AllPairs/PPJoin, q179) vs the
    all-pairs shingle join (q24) on a synthetic ZIPFIAN corpus — the
    vocabulary shape natural text actually has and the sf testdata does
    not (its ~5k-word dense vocab keeps >50% of all pairs inside the
    prefix filter, so all-pairs wins there; see the q179 docstring).

    Corpus (deterministic, JVM-generated): every doc carries 10 tokens
    from a 50-word COMMON head (df = n_docs/5 — these alone make the
    all-pairs join volume 50*(n_docs/5)^2) and 30 df=1 RARE-tail
    tokens; every (10k, 10k+1) pair shares 28 of the 30 rares
    (J = 38/42 = 0.905 — a planted near-dup). The prefix (rarity
    order) is all rare tokens, so the prefix join's candidate set is
    EXACTLY the planted pairs while the all-pairs join still wades
    through the common head. Both legs must return identical counts —
    asserted, not assumed. Legs alternate to cancel host drift."""
    from pyspark.sql import functions as F

    from haskell_dbfunctor_spark.pipelines.dedup_text import (
        near_dup_counts, near_dup_counts_prefix,
    )

    spark = _get_spark(cores)
    calib0 = calibration_seconds()
    planted = F.col("id") % 10 == 1
    base = F.when(planted, F.col("id") - 1).otherwise(F.col("id"))
    common = F.transform(
        F.sequence(F.lit(0), F.lit(9)),
        lambda j: F.concat(F.lit("c"), F.pmod(base * 7 + j, F.lit(50))),
    )
    rare = F.transform(
        F.sequence(F.lit(0), F.lit(29)),
        # planted docs keep the base doc's first 28 rares and replace
        # the last 2 with their own -> J = 38/42 within the pair
        lambda j: F.concat(
            F.lit("r"),
            F.when(planted & (j >= 28), F.col("id") * 30 + j)
            .otherwise(base * 30 + j),
        ),
    )
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.concat(common, rare)).alias("text"),
    ).cache()
    docs.count()

    def leg(fn):
        t0 = time.perf_counter()
        out = fn(docs, threshold)
        total = out.agg(F.sum("n_near_dups")).first()[0]
        return round(time.perf_counter() - t0, 2), int(total)

    res = {"allpairs_s": [], "prefix_s": []}
    totals = set()
    for _ in range(pairs):
        s_a, t_a = leg(near_dup_counts)
        s_p, t_p = leg(near_dup_counts_prefix)
        assert t_a == t_p, f"legs disagree: {t_a} vs {t_p}"
        totals.add(t_a)
        res["allpairs_s"].append(s_a)
        res["prefix_s"].append(s_p)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    print(json.dumps({
        "metric": "prefix_filter_vs_allpairs_exact_neardup",
        "n_docs": n_docs,
        "threshold": threshold,
        "planted_pairs": n_docs // 10,
        "sum_near_dups": totals.pop(),
        "allpairs_s": res["allpairs_s"],
        "prefix_s": res["prefix_s"],
        "speedup_median": round(med(res["allpairs_s"]) / med(res["prefix_s"]), 2),
        "calib_s_start": calib0,
        "calib_s_end": calibration_seconds(),
        "cores": cores,
    }))


def main_containment_cost(cores: int, n_docs: int = 10_000,
                          pairs: int = 3, threshold: float = 0.9) -> None:
    """Containment dedup three ways on a planted-containment Zipfian
    corpus: all-pairs (q151's exact baseline), asymmetric prefix
    filter (exact, prefix length ~(1-t)·|A| grows with doc size), and
    the bottom-k SKETCH (k tokens per contained doc REGARDLESS of
    size — the sublinear path, VERDICT r03 item 5). The sketch's win
    needs docs LONGER than the crossover n ~ k/(1-t): the prefix
    keeps (1-t)n+1 tokens per doc, the sketch always k, so at t=0.9,
    k=8 the corpus uses 1000-token docs (prefix 101 vs sketch 8).
    Corpus: every doc carries 10 tokens from a 50-word common head +
    990 df=1 rare-tail tokens; every (10k, 10k+1) pair plants a
    contained doc — 10 common + 985 of the base's rares + 5 own,
    |A| = 1000, c = 995, containment 0.995 >= 0.9. n-c = 5 < k = 8,
    so the sketch is EXACT here by pigeonhole (and all three counts
    are asserted equal). Legs alternate to cancel host drift."""
    from pyspark.sql import functions as F

    from haskell_dbfunctor_spark.pipelines.dedup_text import (
        containment_density_probe, containment_dup_counts,
        containment_dup_counts_auto, containment_dup_counts_prefix,
        containment_dup_counts_sketch,
    )

    spark = _get_spark(cores)
    calib0 = calibration_seconds()
    planted = F.col("id") % 10 == 1
    base = F.when(planted, F.col("id") - 1).otherwise(F.col("id"))
    common = F.transform(
        F.sequence(F.lit(0), F.lit(9)),
        lambda j: F.concat(F.lit("c"), F.pmod(base * 7 + j, F.lit(50))),
    )
    rare = F.transform(
        # base docs: 990 own rares; planted docs: the base's first 985
        # rares + 5 own -> |A|=1000, overlap 995, containment 0.995
        F.sequence(F.lit(0), F.lit(989)),
        lambda j: F.concat(
            F.lit("r"),
            F.when(planted & (j >= 985), F.col("id") * 990 + j)
            .otherwise(base * 990 + j),
        ),
    )
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.concat(common, rare)).alias("text"),
    ).cache()
    docs.count()

    def leg(fn):
        t0 = time.perf_counter()
        out = fn(docs, threshold)
        total = out.agg(F.sum("n_containers")).first()[0]
        return round(time.perf_counter() - t0, 2), int(total)

    # auto-selection sanity (VERDICT r04 item 2): the density probe
    # must land on the SKETCH here with the same max_df the manual
    # legs below set by hand (hot_cut = n_docs // 10 at this scale)
    probe = containment_density_probe(docs, threshold)
    assert probe["path"] == "sketch", probe
    assert probe["max_df"] == n_docs // 10, probe

    res: dict = {
        "allpairs_s": [], "prefix_s": [], "sketch_s": [], "auto_s": [],
    }
    totals = set()
    for _ in range(pairs):
        s_a, t_a = leg(containment_dup_counts)
        s_p, t_p = leg(containment_dup_counts_prefix)
        # the scale configuration: hot tokens (the 50-word common
        # head, df = n_docs/5) excluded from the candidate join via
        # max_df — the exact verify still sees full token sets
        s_k, t_k = leg(
            lambda d, t: containment_dup_counts_sketch(
                d, t, max_df=n_docs // 10
            )
        )
        # end-to-end auto: pays its own probe, must land ~sketch
        s_u, t_u = leg(containment_dup_counts_auto)
        assert t_a == t_p == t_k == t_u, \
            f"legs disagree: {t_a}/{t_p}/{t_k}/{t_u}"
        totals.add(t_a)
        res["allpairs_s"].append(s_a)
        res["prefix_s"].append(s_p)
        res["sketch_s"].append(s_k)
        res["auto_s"].append(s_u)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    print(json.dumps({
        "metric": "containment_sketch_vs_prefix_vs_allpairs",
        "n_docs": n_docs,
        "threshold": threshold,
        "planted_contained": n_docs // 10,
        "sum_containers": totals.pop(),
        "allpairs_s": res["allpairs_s"],
        "prefix_s": res["prefix_s"],
        "sketch_s": res["sketch_s"],
        "auto_s": res["auto_s"],
        "auto_path": probe["path"],
        "auto_max_df": probe["max_df"],
        "sketch_vs_allpairs": round(
            med(res["allpairs_s"]) / med(res["sketch_s"]), 2),
        "sketch_vs_prefix": round(
            med(res["prefix_s"]) / med(res["sketch_s"]), 2),
        "auto_vs_sketch": round(
            med(res["auto_s"]) / med(res["sketch_s"]), 2),
        "calib_s_start": calib0,
        "calib_s_end": calibration_seconds(),
        "cores": cores,
    }))


def main_forget_cost(cores: int, n_events: int, n_epochs: int = 4) -> None:
    """Right-to-be-forgotten latency on a full production lake: state
    + per-role rollup + inverted term index replayed transactionally,
    then (a) a LOGICAL forget of ~1% of conversations — one
    multi-table transaction deleting the subjects from all three
    tables — and (b) a second forget with purge=True (MoR fold +
    history expiry + orphan sweep = physical erasure). The logical
    number is the per-request queue cost (`--forget-dir` pays it per
    file); the purge number is the compliance-deadline batch cost.
    Both are O(matched + touched buckets), independent of epochs
    replayed, which is the scale claim worth measuring."""
    import uuid as _uuid

    from pyspark.sql import functions as F

    from haskell_dbfunctor_spark.cdc.apply import (
        open_or_create_rollup, open_or_create_term_index,
        open_or_create_transcripts, replay,
    )
    from haskell_dbfunctor_spark.cdc.generator import change_feed
    from haskell_dbfunctor_spark.lake.forget import forget_keys
    from haskell_dbfunctor_spark.lake.transaction import Catalog

    if "SPARK_GRAFT_BENCH_DIR" not in os.environ and os.path.isdir("/dev/shm"):
        d = "/dev/shm/hdbf_bench"
        os.makedirs(d, exist_ok=True)
        os.environ["SPARK_GRAFT_BENCH_DIR"] = d
    spark = _get_spark(cores)
    root = os.path.join(
        os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp"),
        f"hdbf_forgetcost_{_uuid.uuid4().hex[:6]}",
    )
    n_convs = max(n_events // 200, 100)
    state = open_or_create_transcripts(spark, f"{root}/state")
    rollup = open_or_create_rollup(spark, f"{root}/rollup", ["role"])
    tix = open_or_create_term_index(spark, f"{root}/tix")
    cat = Catalog(spark, f"{root}/_catalog")
    feed = change_feed(spark, n_events, seed=7, n_convs=n_convs,
                       n_epochs=n_epochs)
    t0 = time.time()
    replay(state, feed, n_epochs, catalog=cat, rollup=rollup,
           term_index=tix)
    build_s = time.time() - t0
    state_rows = state.read().count()
    k = max(n_convs // 100, 5)

    def _probe(mod_rem: int):
        return (
            state.read().select("conv_id").distinct()
            .where(F.abs(F.hash("conv_id")) % 100 == mod_rem)
            .limit(k)
        )

    legs = {}
    t0 = time.time()
    out1 = forget_keys(cat, state, _probe(0), rollup=rollup,
                       term_index=tix)
    legs["logical_s"] = round(time.time() - t0, 3)
    legs["logical_matched"] = out1["matched"]
    t0 = time.time()
    out2 = forget_keys(cat, state, _probe(1), rollup=rollup,
                       term_index=tix, purge=True)
    legs["purge_s"] = round(time.time() - t0, 3)
    legs["purge_matched"] = out2["matched"]
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({
        "metric": "forget_logical_s",
        "value": legs["logical_s"],
        "unit": "sec (one multi-table forget txn, state+rollup+term index)",
        "n_events": n_events,
        "state_rows": state_rows,
        "forgotten_convs": k,
        "build_s": round(build_s, 3),
        "cores": cores,
        **legs,
    }))


def main_lineage_cost(cores: int, n_rows: int, n_epochs: int = 6,
                      pairs: int = 2, mode: str = "cow") -> None:
    """Row-lineage merge overhead: identical CDC replays (half
    updates / half inserts per epoch) into a plain table vs a
    create(row_lineage=True) table. Lineage pays for (a) two extra
    long columns written per row, (b) the id-coalesce/allocation
    expressions in the merge projection, and (c) the footer pass that
    advances next_row_id — all O(written rows/files), no extra
    shuffle, so the ratio should stay near 1. Legs alternate per round
    to cancel host drift; reports median total merge seconds per leg
    and the lineage/plain ratio."""
    import uuid as _uuid

    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    from haskell_dbfunctor_spark.lake.table import LakeTable

    if "SPARK_GRAFT_BENCH_DIR" not in os.environ and os.path.isdir("/dev/shm"):
        d = "/dev/shm/hdbf_bench"
        os.makedirs(d, exist_ok=True)
        os.environ["SPARK_GRAFT_BENCH_DIR"] = d
    spark = _get_spark(cores)
    root = os.path.join(
        os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp"),
        f"hdbf_lincost_{_uuid.uuid4().hex[:6]}",
    )
    schema = T.StructType([
        T.StructField("k", T.LongType(), False),
        T.StructField("val", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("ts", T.LongType(), True),
    ])
    half = max(n_rows // 2, 1)

    def epoch_df(e: int):
        # first half: updates of uniformly-spread existing keys;
        # second half: brand-new keys [e*half, (e+1)*half)
        upd_span = max(e * half, 1)
        return spark.range(n_rows).select(
            F.when(
                F.col("id") < half,
                F.pmod(F.col("id") * 2654435761, F.lit(upd_span)),
            ).otherwise(e * half + (F.col("id") - half)).alias("k"),
            (F.col("id") * 31 + e).alias("val"),
            F.concat(*[
                F.sha1(F.concat(F.col("id").cast("string"), F.lit(i)))
                for i in range(4)
            ]).alias("text"),
            F.lit(e).cast("long").alias("ts"),
            F.lit("U").alias("op"),
            (F.col("id") + e * n_rows).alias("seq"),
        )

    def one_leg(lineage: bool, tag: str) -> tuple:
        t = LakeTable.create(
            spark, f"{root}/{tag}", schema, key_cols=["k"],
            num_buckets=32, row_lineage=lineage,
        )
        t0 = time.time()
        for e in range(1, n_epochs + 1):
            t.merge(epoch_df(e), epoch_id=f"e{e}", order_cols=("ts", "seq"),
                    drop_cols=("seq",), prune_buckets=False, mode=mode)
        total = time.time() - t0
        # read timed separately: under MoR this pays the collapse,
        # which for lineage tables includes the stable-id resolution
        # (the collect_list leg) — the read-side half of the trade
        t1 = time.time()
        n = t.read().count()
        read_s = time.time() - t1
        shutil.rmtree(f"{root}/{tag}", ignore_errors=True)
        print(f"# {tag}: merge {total:.2f}s read {read_s:.2f}s over "
              f"{n_epochs} epochs ({n} final rows)", file=sys.stderr)
        return total, read_s

    # JVM/codegen warm through both paths
    for lin in (False, True):
        w = LakeTable.create(
            spark, f"{root}/w{int(lin)}", schema, key_cols=["k"],
            num_buckets=8, row_lineage=lin,
        )
        w.merge(epoch_df(1).limit(5000), epoch_id="w",
                order_cols=("ts", "seq"), drop_cols=("seq",),
                prune_buckets=False, mode=mode)
        w.read().count()
        shutil.rmtree(f"{root}/w{int(lin)}", ignore_errors=True)

    plain, lin = [], []
    plain_r, lin_r = [], []
    for r in range(pairs):
        order = [(False, plain, plain_r), (True, lin, lin_r)]
        if r % 2:
            order.reverse()
        for flag, acc, accr in order:
            m, rd = one_leg(flag, f"leg_{int(flag)}_{r}")
            acc.append(m)
            accr.append(rd)
    p_med = sorted(plain)[len(plain) // 2]
    l_med = sorted(lin)[len(lin) // 2]
    pr_med = sorted(plain_r)[len(plain_r) // 2]
    lr_med = sorted(lin_r)[len(lin_r) // 2]
    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({
        "metric": "row_lineage_merge_overhead",
        "value": round(l_med / p_med, 3),
        "unit": "ratio (lineage merge s / plain merge s, median)",
        "mode": mode,
        "rows_per_epoch": n_rows,
        "n_epochs": n_epochs,
        "cores": cores,
        "plain_s": round(p_med, 3),
        "lineage_s": round(l_med, 3),
        "read_ratio": round(lr_med / pr_med, 3) if pr_med else None,
        "plain_read_s": round(pr_med, 3),
        "lineage_read_s": round(lr_med, 3),
        # all rounds, for host-drift auditing (shared-VM box)
        "plain_rounds": [round(x, 2) for x in plain],
        "lineage_rounds": [round(x, 2) for x in lin],
        "host_load1": float(open("/proc/loadavg").read().split()[0]),
    }))


def _one_cluster_submit(n_exec: int, cores_per: int, mem_mb: int,
                        n_events: int, n_epochs: int, py_zip: str,
                        mode: str = "cow") -> dict:
    """One spark-submit run of jobs/cdc_ingest.py under a
    ``local-cluster[n_exec,cores_per,mem_mb]`` master: separate
    executor JVMs with real serialization/RPC boundaries — the closest
    sandbox analog to a multi-executor cluster."""
    repo = os.path.dirname(os.path.abspath(__file__))
    base = os.environ.get("SPARK_GRAFT_BENCH_DIR", "/tmp")
    root = tempfile.mkdtemp(prefix="bench_lc_", dir=base)
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_MASTER", None)
    # identical shuffle width at both cluster sizes (the job's session
    # default): the plan is the same, only executor count varies
    try:
        proc = subprocess.run(
            ["spark-submit",
             "--master", f"local-cluster[{n_exec},{cores_per},{mem_mb}]",
             "--driver-memory", "8g",
             "--py-files", py_zip,
             os.path.join(repo, "jobs", "cdc_ingest.py"),
             "--table-root", root,
             "--events", str(n_events),
             "--epochs", str(n_epochs)]
            + (["--mor"] if mode == "mor" else []),
            capture_output=True, text=True, env=env, cwd=repo,
        )
        lines = [ln for ln in proc.stdout.splitlines()
                 if ln.startswith("{")]
        if proc.returncode != 0 or not lines:
            raise RuntimeError(
                f"spark-submit local-cluster[{n_exec},{cores_per}] failed "
                f"rc={proc.returncode}; stderr tail: {proc.stderr[-2000:]}"
            )
        out = json.loads(lines[-1])
        try:  # co-tenant context for the run (shared host, see BENCH.md)
            out["host_load1"] = float(
                open("/proc/loadavg").read().split()[0]
            )
        except Exception:
            pass
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main_cluster_scaling(n_events: int, pairs: int = 3, n_epochs: int = 4,
                         small_exec: int = 1, large_exec: int = 4,
                         cores_per: int = 8, mem_mb: int = 6144,
                         mode: str = "cow") -> None:
    """North-rule evidence, multi-executor form: the SAME spark-submit
    job (jobs/cdc_ingest.py, --py-files packaged) at N and 4N executor
    JVMs via Spark's local-cluster master. Unlike local[k] threads,
    executors here are separate processes with real serializer + RPC
    + shuffle-fetch boundaries. Protocol is main_scaling's pairwise
    alternation (adjacent runs share host drift; efficiency = median
    per-pair steady-throughput ratio / (large/small))."""
    if "SPARK_GRAFT_BENCH_DIR" not in os.environ and os.path.isdir("/dev/shm"):
        d = "/dev/shm/hdbf_bench"
        os.makedirs(d, exist_ok=True)
        os.environ["SPARK_GRAFT_BENCH_DIR"] = d
    repo = os.path.dirname(os.path.abspath(__file__))
    py_zip = os.path.join(
        tempfile.mkdtemp(prefix="hdbf_pyzip_"), "hdbf.zip"
    )
    subprocess.run(
        ["zip", "-qr", py_zip, "haskell_dbfunctor_spark"],
        cwd=repo, check=True,
    )
    runs: dict[int, list[dict]] = {small_exec: [], large_exec: []}
    ratios: list[float] = []
    for r in range(pairs):
        order = ((small_exec, large_exec) if r % 2 == 0
                 else (large_exec, small_exec))
        pair_res = {}
        for n_exec in order:
            subprocess.run(["sync"], check=False)
            time.sleep(2)
            res = _one_cluster_submit(
                n_exec, cores_per, mem_mb, n_events, n_epochs, py_zip,
                mode=mode,
            )
            runs[n_exec].append(res)
            pair_res[n_exec] = res
            print(f"# pair {r} local-cluster[{n_exec},{cores_per}]: steady "
                  f"{res['steady_events_per_sec']:.0f} events/s "
                  f"(total {res['seconds']:.1f}s)", file=sys.stderr)
        ratio = (pair_res[large_exec]["steady_events_per_sec"]
                 / pair_res[small_exec]["steady_events_per_sec"])
        ratios.append(ratio)
        print(f"# pair {r} speedup {small_exec}->{large_exec} executors: "
              f"{ratio:.2f}x", file=sys.stderr)
    med = sorted(ratios)[len(ratios) // 2]
    best = {c: max(rs, key=lambda x: x["steady_events_per_sec"])
            for c, rs in runs.items()}
    print(json.dumps({
        "metric": "cdc_cluster_scaling_efficiency",
        "value": round(med / (large_exec / small_exec), 3),
        "unit": "ratio",
        "mode": mode,
        "n_events": n_events,
        "small_executors": small_exec,
        "large_executors": large_exec,
        "cores_per_executor": cores_per,
        "median_pair_speedup": round(med, 3),
        "pair_speedups": [round(x, 3) for x in ratios],
        "best_small": best[small_exec],
        "best_large": best[large_exec],
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--skew", action="store_true")
    ap.add_argument("--term-index-cost", action="store_true",
                    help="alternating CDC rounds comparing state-only "
                         "vs inverted-postings-index legs (cow/mor)")
    ap.add_argument("--index-cost", action="store_true",
                    help="marginal throughput cost of the transactional "
                         "dedup-index legs (state vs cow vs mor)")
    ap.add_argument("--mor", action="store_true",
                    help="CDC replay with merge-on-read deltas (O(batch) "
                         "writes) instead of copy-on-write")
    ap.add_argument("--dv", action="store_true",
                    help="CDC replay with deletion-vector merges "
                         "(O(batch) writes, collapse-free reads)")
    ap.add_argument("--cdc", type=int, nargs="?", const=CDC_EVENTS_DEFAULT,
                    default=None, metavar="N_EVENTS")
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--cluster-scaling", action="store_true",
                    help="N vs 4N executor JVMs via spark-submit "
                         "--py-files under local-cluster masters "
                         "(separate processes, real serialization)")
    ap.add_argument("--exec-cores", type=int, default=8,
                    help="cores per executor (--cluster-scaling)")
    ap.add_argument("--exec-mem", type=int, default=6144,
                    help="MB per executor (--cluster-scaling); size "
                         "to the epoch: big epochs (2M rows) need "
                         ">= 12288 to keep GC out of the signal")
    ap.add_argument("--dv-cost", action="store_true",
                    help="delete-mode cost triangle: CoW vs MoR "
                         "tombstones vs deletion vectors on a wide-row "
                         "lake (scattered ~1%% delete)")
    ap.add_argument("--rows", type=int, default=2_000_000,
                    help="base-table rows for --dv-cost / rows per "
                         "epoch for --lineage-cost")
    ap.add_argument("--agg-view-cost", action="store_true",
                    help="marginal steady ev/s cost of the async "
                         "incremental aggregate-view leg")
    ap.add_argument("--codec-cost", action="store_true",
                    help="snappy vs zstd write.compression-codec "
                         "trade: ingest s / live MB / scan s")
    ap.add_argument("--cdf-source-cost", action="store_true",
                    help="streaming lake_cdf drain vs batch "
                         "changes_since over the same trickle window")
    ap.add_argument("--rescale-cost", action="store_true",
                    help="bucket-spec evolution: full rebucket "
                         "(blocking O(table) rewrite) vs lazy declare "
                         "+ progressive folds (max single-commit "
                         "seconds is the availability headline)")
    ap.add_argument("--trickle-cost", action="store_true",
                    help="trickle-update merge cost: plain CoW vs "
                         "file-pruned CoW (range-stats leg on a "
                         "clustered layout, Bloom leg on the hash "
                         "layout) under an append-mostly batch stream")
    ap.add_argument("--sink-cost", action="store_true",
                    help="format('lake') streaming-sink ingest vs the "
                         "MoR merge path on the same feed (per-epoch "
                         "commits, states asserted identical)")
    ap.add_argument("--pq-cost", action="store_true",
                    help="compressed-ANN scan cost: exact cosine over "
                         "float vectors vs PQ ADC over m-tinyint codes "
                         "(+ on-disk byte ratio)")
    ap.add_argument("--vecs", type=int, default=1_000_000,
                    help="corpus vectors for --pq-cost")
    ap.add_argument("--prefix-cost", action="store_true",
                    help="exact near-dup: prefix filter (q179) vs "
                         "all-pairs (q24) on a Zipfian corpus")
    ap.add_argument("--containment-cost", action="store_true",
                    help="containment dedup: bottom-k sketch (q189) vs "
                         "prefix filter (q151) vs all-pairs on a "
                         "planted-containment Zipfian corpus")
    ap.add_argument("--docs", type=int, default=10_000,
                    help="--prefix-cost/--containment-cost corpus size")
    ap.add_argument("--threshold", type=float, default=0.9,
                    help="--containment-cost containment threshold t "
                         "(the prefix filter keeps (1-t)n+1 tokens "
                         "per doc, the sketch always k — low t is "
                         "the sketch's regime)")
    ap.add_argument("--forget-cost", action="store_true",
                    help="right-to-be-forgotten latency: logical "
                         "multi-table forget txn + physical purge on "
                         "a state+rollup+term-index lake")
    ap.add_argument("--lineage-cost", action="store_true",
                    help="row-lineage merge overhead: identical CDC "
                         "replays into a plain vs row_lineage=True "
                         "table (median ratio)")
    ap.add_argument("--cores", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--small", type=int, default=8)
    ap.add_argument("--large", type=int, default=32)
    ap.add_argument("--events", type=int, default=CDC_EVENTS_DEFAULT)
    ap.add_argument("--epochs", type=int, default=CDC_EPOCHS)
    ap.add_argument("--pairs", type=int, default=5)
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    args = ap.parse_args()

    if args.skew:
        main_skew(args.cores, args.events, pairs=min(args.pairs, 3),
                  n_epochs=args.epochs)
    elif args.index_cost:
        main_index_cost(args.cores, args.events,
                        pairs=min(args.pairs, 3), n_epochs=args.epochs)
    elif args.term_index_cost:
        main_index_cost(args.cores, args.events,
                        pairs=min(args.pairs, 3), n_epochs=args.epochs,
                        kind="term")
    elif args.dv_cost:
        main_dv_cost(args.cores, args.rows, pairs=min(args.pairs, 3))
    elif args.codec_cost:
        main_codec_cost(args.cores, args.rows, pairs=min(args.pairs, 3))
    elif args.agg_view_cost:
        main_agg_view_cost(args.cores, args.events,
                           pairs=min(args.pairs, 3), n_epochs=args.epochs)
    elif args.trickle_cost:
        main_trickle_cost(args.cores, args.rows, pairs=min(args.pairs, 3))
    elif args.rescale_cost:
        main_rescale_cost(args.cores, args.rows)
    elif args.cdf_source_cost:
        main_cdf_source_cost(args.cores, args.rows)
    elif args.sink_cost:
        main_sink_cost(args.cores, args.events, n_epochs=args.epochs)
    elif args.pq_cost:
        main_pq_cost(args.cores, args.vecs, pairs=min(args.pairs, 3))
    elif args.lineage_cost:
        main_lineage_cost(args.cores, args.rows, pairs=min(args.pairs, 3),
                          mode="mor" if args.mor
                          else "dv" if args.dv else "cow")
    elif args.forget_cost:
        main_forget_cost(args.cores, args.events, n_epochs=args.epochs)
    elif args.prefix_cost:
        main_prefix_cost(args.cores, args.docs, pairs=min(args.pairs, 3))
    elif args.containment_cost:
        main_containment_cost(args.cores, args.docs,
                              pairs=min(args.pairs, 3),
                              threshold=args.threshold)
    elif args.cluster_scaling:
        main_cluster_scaling(args.events, pairs=min(args.pairs, 3),
                             n_epochs=args.epochs,
                             cores_per=args.exec_cores,
                             mem_mb=args.exec_mem,
                             mode="mor" if args.mor else "cow")
    elif args.scaling:
        main_scaling(args.small, args.large, args.events,
                     pairs=args.pairs, n_epochs=args.epochs,
                     mode="mor" if args.mor else "dv" if args.dv
                     else "cow")
    elif args.cdc is not None:
        main_cdc(args.cores, args.cdc, n_epochs=args.epochs,
                 mode="mor" if args.mor else "dv" if args.dv else "cow")
    else:
        # 2M events amortizes fixed per-epoch cost so the recorded
        # headline reflects steady-state MERGE throughput
        main_bench(args.sf_dir, args.cores, cdc_events=CDC_EVENTS_DEFAULT)
