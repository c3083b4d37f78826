"""End-to-end incremental derived-table maintenance: the CDC replay
loop commits epochs into the lake; a downstream consumer follows the
change feed with a version cursor (changes_since) and folds each
commit's deltas into a per-role aggregate — never re-reading the table.
After every epoch the maintained aggregate must equal a from-scratch
recompute of the snapshot. This is the materialized-view side of the
north-star loop wired through the REAL ingest path (generator -> replay
-> MERGE -> CDF -> maintain)."""

from pyspark.sql import functions as F

from haskell_dbfunctor_spark.cdc.apply import (
    open_or_create_transcripts, replay,
)
from haskell_dbfunctor_spark.cdc.generator import change_feed
from haskell_dbfunctor_spark.lake.incremental import (
    group_sums, maintain_group_sums,
)


def test_cdf_maintained_aggregate_tracks_replay(spark, tmp_path):
    feed = change_feed(
        spark, n_events=4000, n_convs=60, seed=7, n_epochs=4
    ).cache()
    table = open_or_create_transcripts(
        spark, str(tmp_path / "lake"), num_buckets=8
    )

    # the derived table: per-role turn count + total text chars
    def with_len(df):
        return df.withColumn(
            "text_len", F.length(F.coalesce("text", F.lit(""))).cast("long")
        )

    agg = group_sums(with_len(table.read()), ["role"], ["text_len"])
    cursor = table.version

    def check(tag):
        recomputed = {
            r["role"]: (r["n"], r["sum_text_len"])
            for r in group_sums(
                with_len(table.read()), ["role"], ["text_len"]
            ).collect()
        }
        maintained = {
            r["role"]: (r["n"], r["sum_text_len"]) for r in agg.collect()
        }
        assert maintained == recomputed, f"diverged after {tag}"

    # one commit, one consume
    replay(table, feed, n_epochs=1)
    agg = maintain_group_sums(
        agg, with_len(table.changes_since(cursor, preimages=True)),
        ["role"], ["text_len"],
    )
    cursor = table.version
    check("epoch 0")
    # checkpoint the maintained agg (bounds plan lineage, as a real
    # consumer would between refreshes)
    agg = spark.createDataFrame(agg.collect(), agg.schema)

    # THREE commits, ONE consume: per-commit U_pre/U_post pairs must
    # telescope (-v1 +v2 -v2 +v3 ... nets to -first +last per key)
    replay(table, feed, n_epochs=4)
    agg = maintain_group_sums(
        agg, with_len(table.changes_since(cursor, preimages=True)),
        ["role"], ["text_len"],
    )
    cursor = table.version
    check("epochs 1-3 in one consume")
    assert table.version == cursor and table.version >= 4
