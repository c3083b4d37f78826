"""JSONL (newline-delimited JSON) source/sink with declared metadata.

The reference's only source format is CSV (src/RTable/Data/CSV.hs); its
`RTabular` seam (/root/reference/src/RTable/Core.hs:691-697) is
explicitly the extension point for new sources, and JSONL is the lingua
franca of training-data pipelines — so this mirrors the CSV veneer's
contract over `spark.read.json`:

- schema is *declared* via the same ``TableMeta`` (never inferred — a
  100 TB JSONL read with schema inference scans the data twice);
- missing keys and JSON nulls coerce to NULL; type coercion is
  try_cast (malformed values become NULL, not a job kill);
- columns match by NAME (JSON objects are unordered; positional
  matching is a CSV-ism);
- on write, metadata drives the column subset/order; timestamps
  serialize in the standard Oracle format, like the CSV sink.

The scan stays distributed and splittable (JSONL is line-delimited);
reading with an explicit all-string schema + native casts keeps the
whole path JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .csv import TableMeta, _coerce, _serialize


def read_jsonl(spark: SparkSession, path: str, meta: TableMeta) -> DataFrame:
    """Read newline-delimited JSON, coercing named fields per the
    declared metadata (absent key == JSON null == NULL)."""
    raw_schema = T.StructType(
        [T.StructField(name, T.StringType(), True) for name, _ in meta.columns]
    )
    # PERMISSIVE: a malformed line yields a NULL row instead of failing
    # the job (the scale-operable CSVColumnToRDataTypeError analog)
    raw = spark.read.schema(raw_schema).option("mode", "PERMISSIVE").json(path)
    return raw.select(
        *[
            # empty_as_null=False: JSON "" is a real value, not the
            # CSV empty-cell convention
            _coerce(F.col(name), dtype, empty_as_null=False).alias(name)
            for name, dtype in meta.columns
        ]
    )


def write_jsonl(
    df: DataFrame, path: str, meta: TableMeta, single_file: bool = False
) -> None:
    """Write as JSONL; metadata picks the column subset/order and the
    serialization formats (timestamps as Oracle-format strings, doubles
    as JSON numbers — JSON has real numeric types, so the CSV sink's
    %.2f stringification is NOT applied)."""
    cols = []
    for name, dtype in meta.columns:
        d = dtype.strip()
        if d.startswith("Timestamp") or d.startswith("Date"):
            cols.append(_serialize(name, dtype))
        else:
            cols.append(F.col(name))
    out = df.select(*cols)
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").json(path)
