"""Connected components (large-star/small-star) and near-dup clusters.

Ground truth for the property test is a driver-side union-find over the
same edge list — O(edges) on collected test-sized data, exact.
"""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from haskell_dbfunctor_spark.operators.graph import connected_components
from haskell_dbfunctor_spark.pipelines.dedup_text import (
    near_dup_clusters,
    near_dup_counts_lsh,
)


def _cc_oracle(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, "src", "dst").collect()
    }
    return got


def test_chain_needs_multiple_rounds(spark):
    """A 24-node path is the adversarial case for label propagation
    (diameter 23); star contraction must still converge and label
    every node with the minimum."""
    edges = [(i, i + 1) for i in range(23)]
    got = _run(spark, edges)
    assert got == {i: 0 for i in range(24)}


def test_two_components_and_direction_independence(spark):
    edges = [(5, 3), (3, 9), (20, 11), (11, 12)]
    got = _run(spark, edges)
    assert got == {3: 3, 5: 3, 9: 3, 11: 11, 12: 11, 20: 11}


def test_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(40 + 20 * trial)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        got = _run(spark, edges)
        assert got == _cc_oracle(edges)


def test_near_dup_clusters_contract(spark, docs_df=None):
    """Cluster invariants on the real documents table: exactly one
    keeper per cluster (the minimum doc id), sizes sum to the corpus,
    and every doc with a verified near-dup shares its cluster with at
    least one partner (n_near_dups > 0 <-> cluster_size > 1)."""
    d = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")
    docs = spark.read.parquet(f"{d}/documents.parquet")
    cl = near_dup_clusters(docs).persist()
    n_docs = docs.count()
    assert cl.count() == n_docs
    # exactly one keeper per cluster, and it's the min doc_id
    per = cl.groupBy("cluster_id").agg(
        F.sum(F.col("is_keeper").cast("int")).alias("nk"),
        F.min("doc_id").alias("mn"),
        F.count(F.lit(1)).alias("sz"),
        F.first("cluster_size").alias("sz_claimed"),
    )
    bad = per.where(
        (F.col("nk") != 1)
        | (F.col("mn") != F.col("cluster_id"))
        | (F.col("sz") != F.col("sz_claimed"))
    ).count()
    assert bad == 0
    # consistency with the pairwise counts on the same corpus
    counts = near_dup_counts_lsh(docs)
    joined = cl.join(counts, "doc_id")
    mism = joined.where(
        (F.col("n_near_dups") > 0) != (F.col("cluster_size") > 1)
    ).count()
    assert mism == 0
    cl.unpersist()


def test_quality_keeper_selection(spark):
    """keeper_score keeps the highest-scoring doc per cluster (ties ->
    smaller id); exactly one keeper per cluster, singletons keep
    themselves."""
    d = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")
    docs = spark.read.parquet(f"{d}/documents.parquet")
    cl = near_dup_clusters(
        docs, keeper_score=F.length("text")
    ).persist()
    per = cl.groupBy("cluster_id").agg(
        F.sum(F.col("is_keeper").cast("int")).alias("nk")
    )
    assert per.where(F.col("nk") != 1).count() == 0
    # the keeper's text length is the cluster max
    lens = docs.select("doc_id", F.length("text").alias("len"))
    j = cl.join(lens, "doc_id")
    mx = j.groupBy("cluster_id").agg(F.max("len").alias("mx"))
    bad = (
        j.where("is_keeper").join(mx, "cluster_id")
        .where(F.col("len") != F.col("mx")).count()
    )
    assert bad == 0
    # singletons keep themselves
    singles = cl.where((F.col("cluster_size") == 1) & ~F.col("is_keeper"))
    assert singles.count() == 0
    cl.unpersist()


def test_cc_local_matches_distributed(spark):
    """Round 6: the driver-side smallness cutover (_cc_local, NumPy
    min-label propagation) must produce the identical (node,
    component) set as the distributed star-contraction loop on the
    same edges — including min-id components, chains, and multiple
    separate components."""
    import random

    from haskell_dbfunctor_spark.operators import graph as G

    rnd = random.Random(7)
    edges = []
    # 40 clusters of random size with random internal spanning edges,
    # node ids shuffled so minima land arbitrarily
    ids = list(range(10_000, 12_000))
    rnd.shuffle(ids)
    pos = 0
    for _ in range(40):
        size = rnd.randint(1, 12) + 1
        group = ids[pos:pos + size]
        pos += size
        for i in range(1, len(group)):
            edges.append((group[i], group[rnd.randrange(i)]))
    df = spark.createDataFrame(edges, "src long, dst long")
    local = {(r[0], r[1]) for r in G.connected_components(df).collect()}
    # force the distributed path by dropping the cutover
    old = G._CC_LOCAL_MAX_EDGES
    G._CC_LOCAL_MAX_EDGES = -1
    try:
        dist = {(r[0], r[1]) for r in G.connected_components(df).collect()}
    finally:
        G._CC_LOCAL_MAX_EDGES = old
    assert local == dist


def test_cc_local_string_nodes(spark):
    from haskell_dbfunctor_spark.operators.graph import connected_components

    df = spark.createDataFrame(
        [("b", "c"), ("c", "a"), ("x", "y")], "src string, dst string"
    )
    got = {(r[0], r[1]) for r in connected_components(df).collect()}
    assert got == {("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")}
