"""Debezium-envelope CDC source: binlog JSON -> engine change batches.

The north rule's feed is a "binlog/WAL tail"; the de-facto wire format
for database binlogs is the Debezium change envelope (one JSON object
per event: ``before``/``after`` row images, ``op`` c/u/d/r, source
metadata with an LSN, commit ``ts_ms``).  The reference's source seam
(`/root/reference/src/RTable/Core.hs:691-697`, the ``RTabular`` class
CSV plugs into) is explicitly the extension point for new formats —
this module is that seam for Debezium JSONL, normalizing envelopes
into the (op I/U/D, <value columns>, seq) change-batch shape every
apply path in this engine consumes (``LakeTable.merge``,
``cdc.apply.replay``, ``streaming.tailer.tail_feed_dir``).

Everything is JVM-side (``from_json``/``to_json`` — Jackson inside
whole-stage codegen); no Python touches a row, so a 10^10-event JSONL
tail parses at scan speed and the text source stays line-splittable
across executors.

Wire conventions (Debezium semantics, not inventions):
- ``op``: ``c`` (insert), ``u`` (update), ``r`` (snapshot read — the
  initial-load rows Debezium emits before streaming) all normalize to
  upserts (``I``/``U``/``I``); ``d`` is a delete whose row image is in
  ``before`` (``after`` is null).  Anything else (e.g. ``t`` truncate,
  ``m`` message) has no row-level meaning here and FAILS THE PARSE by
  default — the engine's merge treats every non-``D`` op as an upsert,
  so silently passing an unknown op through would corrupt state.
- temporal columns ride as ``io.debezium.time.MicroTimestamp``: epoch
  MICROSECONDS as a JSON long (Debezium never emits ISO strings for
  TIMESTAMP columns).  Lossless against Spark's micros-precision
  TimestampType in both directions.
- ``seq`` (the engine's total-order tiebreak) = ``source.lsn`` when
  present, else the envelope ``ts_ms`` — the same "position in the
  WAL" role it plays in Postgres/MySQL connectors.
- a JSON line that fails to parse at all (malformed, or not an
  envelope) yields a NULL payload; ``parse_debezium`` routes those to
  the same loud-or-skip policy as unknown ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

#: op byte -> engine op. ``r`` (snapshot read) and ``c`` are both first
#: images of a key — I; ``u`` — U; ``d`` — D (image in ``before``).
_OP_MAP = {"c": "I", "r": "I", "u": "U", "d": "D"}


def wire_value_schema(value_schema: T.StructType) -> T.StructType:
    """The ``before``/``after`` image schema AS SERIALIZED: timestamp
    columns become longs (MicroTimestamp — epoch micros), everything
    else keeps its type. Date columns likewise ride as epoch-day ints
    (``io.debezium.time.Date``)."""
    fields = []
    for f in value_schema.fields:
        if isinstance(f.dataType, T.TimestampType):
            fields.append(T.StructField(f.name, T.LongType(), True))
        elif isinstance(f.dataType, T.DateType):
            fields.append(T.StructField(f.name, T.IntegerType(), True))
        else:
            fields.append(T.StructField(f.name, f.dataType, True))
    return T.StructType(fields)


def envelope_schema(value_schema: T.StructType) -> T.StructType:
    """Reader schema for one Debezium envelope (the ``payload`` level —
    schemaless JSON converter layout, the common Kafka-Connect
    deployment; a ``{"schema":..., "payload":...}`` wrapper is handled
    by ``parse_debezium(payload_wrapped=True)``)."""
    wire = wire_value_schema(value_schema)
    return T.StructType(
        [
            T.StructField("before", wire, True),
            T.StructField("after", wire, True),
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
            T.StructField(
                "source",
                T.StructType(
                    [
                        T.StructField("lsn", T.LongType(), True),
                        T.StructField("ts_ms", T.LongType(), True),
                        T.StructField("db", T.StringType(), True),
                        T.StructField("table", T.StringType(), True),
                        T.StructField("connector", T.StringType(), True),
                        T.StructField("snapshot", T.StringType(), True),
                    ]
                ),
                True,
            ),
            T.StructField(
                "transaction",
                T.StructType(
                    [
                        T.StructField("id", T.StringType(), True),
                        T.StructField("total_order", T.LongType(), True),
                        T.StructField(
                            "data_collection_order", T.LongType(), True
                        ),
                    ]
                ),
                True,
            ),
        ]
    )


def _image_to_value(img, value_schema: T.StructType):
    """Project a wire image struct back to engine types (micros ->
    timestamp, epoch-day -> date)."""
    cols = []
    for f in value_schema.fields:
        c = img.getField(f.name)
        if isinstance(f.dataType, T.TimestampType):
            c = F.timestamp_micros(c)
        elif isinstance(f.dataType, T.DateType):
            c = F.date_from_unix_date(c)
        cols.append(c.alias(f.name))
    return cols


def parse_debezium(
    df: DataFrame,
    value_schema: T.StructType,
    *,
    json_col: str = "value",
    op_col: str = "op",
    seq_col: str = "seq",
    on_unknown: str = "error",
    payload_wrapped: bool = False,
    keep_source_ts: bool = False,
) -> DataFrame:
    """Normalize a column of Debezium JSON envelopes into a change
    batch: (<value columns>, ``op`` I/U/D, ``seq``).

    ``df[json_col]`` holds one envelope per row (the Kafka record value
    / one JSONL line).  ``on_unknown``: ``"error"`` (default) makes an
    unrecognized op or an unparseable line fail the job at execution
    time — merge would silently upsert it otherwise; ``"skip"`` filters
    such rows.  ``payload_wrapped=True`` unwraps the
    ``{"schema":...,"payload":{...}}`` converter layout first.
    ``keep_source_ts=True`` adds ``_source_ts_ms`` (commit wall-clock)
    for freshness-lag metrics.
    """
    if on_unknown not in ("error", "skip"):
        raise ValueError(f"on_unknown must be 'error' or 'skip': {on_unknown!r}")
    env_schema = envelope_schema(value_schema)
    raw = F.col(json_col)
    if payload_wrapped:
        wrapper = T.StructType([T.StructField("payload", env_schema, True)])
        env = F.from_json(raw, wrapper).getField("payload")
    else:
        env = F.from_json(raw, env_schema)
    parsed = df.select(raw.alias("__raw"), env.alias("__env"))

    op_wire = F.col("__env.op")
    op = F.when(
        op_wire.isin(*_OP_MAP), F.element_at(F.create_map(
            *[F.lit(x) for kv in _OP_MAP.items() for x in kv]
        ), op_wire)
    )
    # d's image is the BEFORE (after is null — the tombstone shape);
    # everything else reads after. coalesce also tolerates connectors
    # that populate both on updates.
    img = F.when(op_wire == "d", F.col("__env.before")).otherwise(
        F.col("__env.after")
    )
    bad = F.col("__env").isNull() | op.isNull() | img.isNull()
    if on_unknown == "error":
        # The loud path rides INSIDE the projected op column instead of
        # a separate Filter: a Filter's predicate gets pushed through
        # the parse projection, inlining the __env alias — measured SIX
        # from_json evaluations per row in the Filter node alone (q168,
        # round 6). With every reference in one Project, whole-stage
        # codegen's subexpression elimination parses each envelope
        # once. Failure semantics are unchanged: any bad row raises at
        # execution time with the same message (op is always part of
        # the normalized output, so the check always evaluates).
        op = F.when(
            bad,
            F.raise_error(
                F.concat(
                    F.lit("debezium: unparseable envelope or unknown op: "),
                    F.substring(F.coalesce(F.col("__raw"), F.lit("<null>")),
                                1, 200),
                )
            ).cast("string"),
        ).otherwise(op)
    else:
        parsed = parsed.where(~bad)

    seq = F.coalesce(F.col("__env.source.lsn"), F.col("__env.ts_ms"))
    out = [
        *_image_to_value(img, value_schema),
        op.alias(op_col),
        seq.alias(seq_col),
    ]
    if keep_source_ts:
        out.append(F.col("__env.ts_ms").alias("_source_ts_ms"))
    return parsed.select(*out)


def to_debezium_json(
    df: DataFrame,
    value_schema: T.StructType,
    *,
    op_col: str = "op",
    seq_col: str = "seq",
    connector: str = "engine",
    table: str = "transcripts",
) -> DataFrame:
    """Render a change batch (engine ops I/U/D + value columns + seq)
    into Debezium envelope JSON strings — the inverse of
    ``parse_debezium`` (roundtrip-exact; pinned by tests). Used to
    synthesize realistic WAL feeds from the deterministic generator and
    as a CDC *sink* shape (publishing a lake CDF to downstream
    consumers in the format their Kafka tooling already speaks)."""
    wire_cols = []
    for f in value_schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, T.TimestampType):
            c = F.unix_micros(c)
        elif isinstance(f.dataType, T.DateType):
            c = F.unix_date(c)
        wire_cols.append(c.alias(f.name))
    image = F.struct(*wire_cols)
    op = F.col(op_col)
    op_wire = (
        F.when(op == "I", F.lit("c"))
        .when(op == "U", F.lit("u"))
        .when(op == "D", F.lit("d"))
        .otherwise(F.raise_error(F.concat(F.lit("to_debezium_json: bad op "),
                                          op)))
    )
    null_image = F.lit(None).cast(wire_value_schema(value_schema))
    ts_field = next(
        (f.name for f in value_schema.fields
         if isinstance(f.dataType, T.TimestampType)),
        None,
    )
    ts_ms = (
        (F.unix_micros(F.col(ts_field)) / 1000).cast("long")
        if ts_field
        else F.col(seq_col).cast("long")
    )
    envelope = F.struct(
        F.when(op == "D", image).otherwise(null_image).alias("before"),
        F.when(op == "D", null_image).otherwise(image).alias("after"),
        op_wire.alias("op"),
        ts_ms.alias("ts_ms"),
        F.struct(
            F.col(seq_col).cast("long").alias("lsn"),
            ts_ms.alias("ts_ms"),
            F.lit("engine").alias("db"),
            F.lit(table).alias("table"),
            F.lit(connector).alias("connector"),
            F.lit("false").alias("snapshot"),
        ).alias("source"),
        F.lit(None).cast(
            "struct<id:string,total_order:bigint,data_collection_order:bigint>"
        ).alias("transaction"),
    )
    # ignoreNullFields=false: Debezium emits explicit nulls (a missing
    # "after" key and "after": null are both accepted on parse, but the
    # explicit form is what real connectors produce)
    return df.select(
        F.to_json(envelope, {"ignoreNullFields": "false"}).alias("value")
    )


def read_debezium_jsonl(
    spark: SparkSession,
    path: str,
    value_schema: T.StructType,
    **parse_kwargs,
) -> DataFrame:
    """Batch-read a directory/file of Debezium JSONL into a normalized
    change batch. Line-delimited text scan — splittable, predicate-free
    (filters apply post-parse; there is nothing to push into a text
    scan), distributed."""
    raw = spark.read.text(path).withColumnRenamed("value", "value")
    return parse_debezium(raw, value_schema, json_col="value", **parse_kwargs)


def stream_debezium_jsonl(
    spark: SparkSession,
    feed_dir: str,
    value_schema: T.StructType,
    *,
    max_files_per_trigger: int | None = None,
    **parse_kwargs,
) -> DataFrame:
    """Streaming flavor of :func:`read_debezium_jsonl` for the WAL
    tail: ``readStream.text`` over the feed dir (new files = new
    micro-batches, offsets checkpointed by the sink loop), envelopes
    normalized in-stream. Feed into
    ``streaming.tailer.tail_feed_dir(..., source=...)``."""
    reader = spark.readStream
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.text(feed_dir)
    return parse_debezium(raw, value_schema, json_col="value", **parse_kwargs)
