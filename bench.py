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


def run_cdc(spark, n_events: int, n_epochs: int = CDC_EPOCHS) -> dict:
    """One full CDC replay: deterministic feed -> epoch loop of LWW dedup
    + bucket-pruned MERGE + checkpoint into a fresh LakeTable."""
    from haskell_dbfunctor_spark.cdc.apply import open_or_create_transcripts, replay
    from haskell_dbfunctor_spark.cdc.generator import change_feed

    root = tempfile.mkdtemp(prefix="bench_lake_")
    try:
        feed = change_feed(
            spark,
            n_events,
            n_convs=max(n_events // 200, 100),
            n_epochs=n_epochs,
            evolution_epoch=n_epochs // 2,
        )
        table = open_or_create_transcripts(spark, root, num_buckets=64)
        stats = replay(
            table, feed, n_epochs, evolution_epoch=n_epochs // 2,
            files_per_bucket=2,
        )
        final_rows = table.read().count()
        return {
            "n_events": n_events,
            "n_epochs": n_epochs,
            "seconds": round(stats.seconds, 3),
            "events_per_sec": round(stats.events_per_sec, 1),
            "final_rows": final_rows,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _get_spark(cores: int):
    from haskell_dbfunctor_spark.session import get_spark

    return get_spark(app_name=f"bench-local{cores}", cores=cores)


def main_bench(sf_dir: str, cores: int, cdc_events: int) -> None:
    import __spark_entry__ as entry_mod

    spark = _get_spark(cores)
    timings: dict[str, float] = {}
    for name, fn in entry_mod.queries().items():
        t0 = time.time()
        _materialize(fn(spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    cdc = run_cdc(spark, cdc_events)
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(sf_dir),
        "cores": cores,
        "cdc": cdc,
        "cdc_events_per_sec": cdc["events_per_sec"],
    }))


def main_cdc(cores: int, n_events: int) -> None:
    spark = _get_spark(cores)
    out = run_cdc(spark, n_events)
    out.update({"cores": cores})
    print(json.dumps(out))


def main_scaling(small: int, large: int, n_events: int) -> None:
    """Same job, same input, two parallelism levels, each in a fresh JVM."""
    results = {}
    for cores in (small, large):
        env = dict(os.environ)
        env.pop("SPARK_GRAFT_MASTER", None)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--cdc", str(n_events), "--cores", str(cores)],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
        results[cores] = json.loads(line)
        print(f"# local[{cores}]: {results[cores]['events_per_sec']:.0f} events/s "
              f"({results[cores]['seconds']:.1f}s)", file=sys.stderr)

    t_small, t_large = results[small]["seconds"], results[large]["seconds"]
    speedup = t_small / t_large
    efficiency = speedup / (large / small)
    print(json.dumps({
        "metric": "cdc_scaling_efficiency",
        "value": round(efficiency, 3),
        "unit": "ratio",
        "n_events": n_events,
        "small_cores": small,
        "large_cores": large,
        "small": results[small],
        "large": results[large],
        "speedup": round(speedup, 3),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cdc", type=int, nargs="?", const=CDC_EVENTS_DEFAULT,
                    default=None, metavar="N_EVENTS")
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--cores", type=int, default=DEFAULT_CPUS)
    ap.add_argument("--small", type=int, default=8)
    ap.add_argument("--large", type=int, default=32)
    ap.add_argument("--events", type=int, default=CDC_EVENTS_DEFAULT)
    ap.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    args = ap.parse_args()

    if args.scaling:
        main_scaling(args.small, args.large, args.events)
    elif args.cdc is not None:
        main_cdc(args.cores, args.cdc)
    else:
        main_bench(args.sf_dir, args.cores, cdc_events=500_000)
