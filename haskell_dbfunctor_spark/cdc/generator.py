"""Deterministic change-event generator for the transcripts table.

Shape mandated by BASELINE.json input_hint / FIXTURES.md F1+F2:
target (conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp); feed adds (op I/U/D, seq long, epoch int).

Everything is derived JVM-side from ``spark.range`` with hash functions
— no driver-side data, no Python in the hot path, fully deterministic
for a given (seed, n_events), and generates 10^10 events the same way
it generates 10^4 (it is a distributed computation, not a file).

Properties the engine's tests rely on:
- ``seq`` is the global binlog order; ``ts`` is monotone in ``seq``
  (commit-ordered, second granularity → many ties, broken by seq).
- keys are skewed: ``hot_fraction`` of events hit ``n_hot``
  conversations (exercises salt/skew handling).
- duplicate updates to one key within an epoch are common (LWW dedup).
- deletes (~10%) and delete-then-reinsert sequences occur naturally.
- epochs < ``evolution_epoch`` do NOT carry the ``tool`` column at all
  (schema evolution mid-stream, FIXTURES.md F2 profile e).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

KEY_COLS = ["conv_id", "turn_idx"]

_ROLES = ["user", "assistant", "tool"]
_TOOLS = ["search", "bash", "python", "browser"]
_WORDS = [
    "merge", "filter", "join", "window", "shuffle", "broadcast",
    "partition", "checkpoint", "replay", "epoch", "upsert", "delta",
]


def change_feed(
    spark: SparkSession,
    n_events: int,
    *,
    seed: int = 42,
    n_convs: int = 1000,
    max_turns: int = 50,
    n_epochs: int = 8,
    hot_fraction: float = 0.3,
    n_hot: int = 3,
    delete_pct: int = 10,
    evolution_epoch: int | None = None,
    start_epoch_ts: int = 1_700_000_000,
    events_per_second: int = 10,
) -> DataFrame:
    """Build the deterministic change-event DataFrame.

    Returns columns (op, conv_id, turn_idx, role, text, tool, ts, seq,
    epoch); pre-evolution epochs carry tool=NULL here — callers that
    exercise schema evolution drop the column per-batch (see
    ``epoch_batch``).
    """
    if n_events < 1:
        raise ValueError(f"n_events must be >= 1, got {n_events}")
    df = spark.range(n_events).withColumnRenamed("id", "seq")
    h = lambda *cols: F.xxhash64(*cols, F.lit(seed))  # noqa: E731
    pm = lambda c, n: F.pmod(c, F.lit(n))  # noqa: E731

    is_hot = pm(h(F.col("seq"), F.lit(1)), 1000) < int(hot_fraction * 1000)
    conv_idx = F.when(is_hot, pm(h(F.col("seq"), F.lit(2)), n_hot)).otherwise(
        pm(h(F.col("seq"), F.lit(3)), n_convs)
    )
    events_per_epoch = max(n_events // n_epochs, 1)

    out = (
        df.withColumn("conv_id", F.concat(F.lit("conv-"), F.lpad(conv_idx.cast("string"), 6, "0")))
        .withColumn("turn_idx", pm(h(F.col("seq"), F.lit(4)), max_turns).cast("int"))
        .withColumn(
            "op",
            F.when(pm(h(F.col("seq"), F.lit(5)), 100) < delete_pct, F.lit("D"))
            .when(pm(h(F.col("seq"), F.lit(5)), 100) < 40, F.lit("I"))
            .otherwise(F.lit("U")),
        )
        .withColumn(
            "role",
            F.element_at(
                F.array(*[F.lit(r) for r in _ROLES]),
                pm(h(F.col("seq"), F.lit(6)), len(_ROLES)).cast("int") + 1,
            ),
        )
        .withColumn(
            "text",
            F.concat_ws(
                " ",
                F.element_at(
                    F.array(*[F.lit(w) for w in _WORDS]),
                    pm(h(F.col("seq"), F.lit(7)), len(_WORDS)).cast("int") + 1,
                ),
                F.element_at(
                    F.array(*[F.lit(w) for w in _WORDS]),
                    pm(h(F.col("seq"), F.lit(8)), len(_WORDS)).cast("int") + 1,
                ),
                F.col("conv_id"),
                F.col("turn_idx").cast("string"),
                F.concat(F.lit("v"), F.col("seq").cast("string")),
            ),
        )
        .withColumn(
            "tool",
            F.when(
                F.col("role") == "tool",
                F.element_at(
                    F.array(*[F.lit(t) for t in _TOOLS]),
                    pm(h(F.col("seq"), F.lit(9)), len(_TOOLS)).cast("int") + 1,
                ),
            ),
        )
        .withColumn(
            "ts",
            F.timestamp_seconds(
                F.lit(start_epoch_ts) + (F.col("seq") / events_per_second).cast("long")
            ),
        )
        .withColumn(
            "epoch",
            F.least(
                (F.col("seq") / events_per_epoch).cast("int"), F.lit(n_epochs - 1)
            ),
        )
    )
    cols = ["op", "conv_id", "turn_idx", "role", "text", "tool", "ts", "seq", "epoch"]
    out = out.select(*cols)
    if evolution_epoch is not None:
        # the column exists schema-wise but is all-NULL before evolution;
        # epoch_batch() drops it entirely for pre-evolution batches
        out = out.withColumn(
            "tool",
            F.when(F.col("epoch") >= evolution_epoch, F.col("tool")),
        )
    return out


def epoch_ids(n_epochs: int) -> list[str]:
    return [f"epoch-{e:05d}" for e in range(n_epochs)]


def epoch_batch(
    feed: DataFrame, epoch: int, *, evolution_epoch: int | None = None
) -> DataFrame:
    """One commit-epoch's events; pre-evolution batches physically lack
    the ``tool`` column (the schema-evolution trigger)."""
    b = feed.where(F.col("epoch") == epoch)
    if evolution_epoch is not None and epoch < evolution_epoch:
        b = b.drop("tool")
    return b
