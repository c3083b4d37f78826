"""haskell_dbfunctor_spark — a from-scratch PySpark-native analytics +
CDC/incremental-ingest engine with the query capabilities of
nkarag/haskell-DBFunctor (reference at /root/reference, read-only).

Not a port: the reference's RTable/Julius operator *semantics*
(/root/reference/src/RTable/Core.hs, src/Etl/Julius.hs) are re-expressed
as idiomatic pyspark.sql DataFrame plans optimized by Catalyst; the
ETL-pipeline model becomes a chained-DataFrame Pipeline; the
upsertRTab MERGE algorithm (Core.hs:3649-3735) becomes an exactly-once,
bucket-pruned, copy-on-write lake MERGE driven by a CDC change feed.

Layers
------
- session      : SparkSession factory (AQE, Arrow, UTC, pinned shuffle)
- lake         : versioned parquet lake table w/ atomic manifest commits,
                 snapshot reads, schema evolution, idempotent epoch MERGE
- cdc          : deterministic change-feed generator, LWW dedup, replay
                 loop with checkpoint/resume, lineage + metrics
- operators    : the relational kernel (SURVEY.md §2) over DataFrames
- functions    : scalar library (nvl/decode/instr/Oracle ts formats)
- plans        : Julius-like Pipeline composition with named results
- pipelines    : training-data ops (dedup, similarity, text analysis,
                 multimodal plumbing)
- streaming    : Structured Streaming tailer (foreachBatch -> MERGE)
"""

__version__ = "0.1.0"
