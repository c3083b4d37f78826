"""Round-6 optimization harness — NOT part of the driver contract.

Isolated per-query timing with the noop sink (guide §1.4), Spark job
counts, and a coarse driver-vs-JVM split per query. ``bench.py`` is
frozen for measurement; numbers cited in OPTIMIZATION_r06.md come from
here when they need more detail than the headline run.

Usage:
  python bench_extra.py q74_txn_atomic_commit q181_ivm_two_hop
  python bench_extra.py --top 20          # the 20 heaviest from BENCH_DETAIL.json
  python bench_extra.py --all             # every query, one line each
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _get_spark(cores: int):
    from haskell_dbfunctor_spark.session import get_spark

    extra = {"spark.ui.showConsoleProgress": "false"}
    base = os.environ.get("SPARK_GRAFT_BENCH_DIR")
    if not base and os.path.isdir("/dev/shm"):
        base = "/dev/shm/hdbf_bench"
        os.makedirs(base, exist_ok=True)
        os.environ["SPARK_GRAFT_BENCH_DIR"] = base
    if base:
        d = os.path.join(base, "spark-local")
        os.makedirs(d, exist_ok=True)
        extra["spark.local.dir"] = d
    return get_spark(app_name="bench-extra", cores=cores, extra_conf=extra)


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir, cores = DEFAULT_SF_DIR, DEFAULT_CPUS
    repeats = 1
    if "--repeats" in args:
        i = args.index("--repeats")
        repeats = int(args[i + 1])
        del args[i:i + 2]
    names: list[str] = []
    if "--all" in args:
        args.remove("--all")
        names = ["*"]
    if "--top" in args:
        i = args.index("--top")
        k = int(args[i + 1])
        del args[i:i + 2]
        detail = json.load(open("BENCH_DETAIL.json"))
        names += [
            n for n, _ in sorted(
                detail["queries"].items(), key=lambda kv: -(kv[1] or 0)
            )[:k]
        ]
    names += args

    import __spark_entry__ as entry_mod

    spark = _get_spark(cores)
    sc = spark.sparkContext
    qs = entry_mod.queries()
    if "*" in names:
        names = list(qs)

    # same warmup shapes as bench.py's generic block (not the lake /
    # streaming blocks — cold-start costs are part of what we measure
    # here unless a query is run twice via --repeats)
    from pyspark.sql import functions as F

    spark.range(1_000_000).groupBy((F.col("id") % 97).alias("k")).agg(
        F.sum("id")
    ).write.format("noop").mode("overwrite").save()

    tracker = sc.statusTracker()
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        for r in range(repeats):
            jobs0 = len(tracker.getJobIdsForGroup(None) or [])
            sc.setJobDescription(f"bench_extra:{name}")
            t_build0 = time.time()
            df = qs[name](spark, sf_dir)
            t_build = time.time() - t_build0
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            sc.setJobDescription(None)
            jobs1 = len(tracker.getJobIdsForGroup(None) or [])
            print(
                json.dumps(
                    {
                        "query": name,
                        "run": r,
                        "build_s": round(t_build, 3),
                        "exec_s": round(wall, 3),
                        "total_s": round(t_build + wall, 3),
                        "n_jobs": jobs1 - jobs0,
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
