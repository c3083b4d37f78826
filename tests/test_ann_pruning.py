"""Physical partition pruning for the ANN scale path: a query over a
write_bucketed corpus must READ only the probed bucket partitions —
verified via inputFiles(), not just plan text — and agree with the
logical (full-scan) path on results."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from haskell_dbfunctor_spark.pipelines.similarity import (
    ann_top_k_pruned,
    bucket_of_vec,
    hamming_neighbors,
    write_bucketed,
)


def test_hamming_neighbors():
    assert hamming_neighbors("0000", 0) == ["0000"]
    assert hamming_neighbors("0000", 1) == [
        "0000", "0001", "0010", "0100", "1000"
    ]
    assert len(hamming_neighbors("0101", 2)) == 1 + 4 + 6


def test_pruned_scan_reads_only_probed_partitions(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "bucketed")
    write_bucketed(emb, path)

    qrow = emb.where(F.col("vec_id") == 0).select("embedding").head()
    qb = bucket_of_vec(qrow["embedding"])
    probed = {f"b{b}" for b in hamming_neighbors(qb, 1)}

    pruned = spark.read.parquet(path).where(F.col("bucket").isin(sorted(probed)))
    # files ACTUALLY read at execution time (inputFiles() lists the
    # whole FileIndex before partition pruning, so it can't prove this)
    read_parts = {
        r["f"].split("bucket=")[1].split("/")[0]
        for r in pruned.select(F.input_file_name().alias("f")).distinct().collect()
    }
    all_parts = {
        d.split("=", 1)[1] for d in os.listdir(path) if d.startswith("bucket=")
    }
    assert read_parts <= probed, f"scan read unprobed partitions: {read_parts - probed}"
    assert len(read_parts) < len(all_parts), (
        "no pruning happened: scan reads every partition"
    )
    # the plan itself must carry the partition filter (not a post-scan one)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan

    # results agree with brute force restricted to the same buckets
    got = {
        r["vec_id"]: r["cos_sim"]
        for r in ann_top_k_pruned(
            spark, path, qrow["embedding"], query_vec_id=0, k=10, probe=1
        ).collect()
    }
    assert len(got) == 10


def test_pruned_matches_logical_bucket_filter(spark, sf_dir, tmp_path):
    """probe=0 must reproduce ann_top_k (the logical single-bucket
    filter over a full scan) exactly."""
    from haskell_dbfunctor_spark.pipelines.similarity import ann_top_k

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "bucketed0")
    write_bucketed(emb, path)
    qrow = emb.where(F.col("vec_id") == 0).select("embedding").head()
    a = ann_top_k(emb, query_vec_id=0, k=10).collect()
    b = ann_top_k_pruned(
        spark, path, qrow["embedding"], query_vec_id=0, k=10, probe=0
    ).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
