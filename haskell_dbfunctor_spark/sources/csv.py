"""CSV source/sink with declared metadata — the reference's RTabular
boundary (/root/reference/src/RTable/Core.hs:691-697; CSV instance
src/RTable/Data/CSV.hs:166-168).

Reference semantics kept:
- schema is *declared*, not inferred (createRTableMData,
  Core.hs:1639-1645): user supplies column -> type incl. Oracle-style
  date/timestamp format strings;
- columns match by POSITION against the file header
  (csvToRTable, CSV.hs:340-371);
- empty string coerces to NULL (CSV.hs:342-344);
- custom delimiter + has-header options (readCSVwithOptions,
  CSV.hs:228-262);
- on write, metadata drives the column subset/order; doubles print
  %.2f and timestamps re-serialize as DD/MM/YYYY HH24:MI:SS
  (rtableToCSV, CSV.hs:391-455).

Scale note: this is a thin veneer over spark.read.csv — the scan stays
distributed, splittable, and schema-pruned; per-type coercion is native
Column casts (no Python).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.scalar import oracle_fmt_to_spark

STD_TIMESTAMP_FMT = "DD/MM/YYYY HH24:MI:SS"  # stdTimestampFormat, Core.hs:1578
STD_DATE_FMT = "DD/MM/YYYY"  # stdDateFormat, Core.hs:907


@dataclass
class CSVOptions:
    """readCSVwithOptions options (CSV.hs:228-231)."""

    delimiter: str = ","
    has_header: bool = True


@dataclass
class TableMeta:
    """RTableMData (Core.hs:1628-1645): declared name, ordered columns
    with reference types, PK / unique keys (never enforced except by
    MERGE, same as the reference)."""

    name: str
    columns: Sequence[tuple[str, str]]  # (col, "Varchar"|"Integer"|"Double"|"Date <fmt>"|"Timestamp <fmt>")
    pk: Sequence[str] = field(default_factory=list)

    def col_names(self) -> list[str]:
        return [c for c, _ in self.columns]


def _coerce(col: F.Column, dtype: str, empty_as_null: bool = True) -> F.Column:
    # ""->NULL is the CSV convention (CSV.hs:342-344); JSONL keeps ""
    base = F.when(col == "", None).otherwise(col) if empty_as_null else col
    d = dtype.strip()
    if d == "Integer":
        return base.try_cast("long")  # malformed -> NULL, not a job kill
    if d == "Double":
        return base.try_cast("double")
    if d.startswith("Timestamp"):
        fmt = d.split(None, 1)[1] if " " in d else STD_TIMESTAMP_FMT
        return F.try_to_timestamp(base, F.lit(oracle_fmt_to_spark(fmt, lenient=True)))
    if d.startswith("Date"):
        fmt = d.split(None, 1)[1] if " " in d else STD_DATE_FMT
        return F.try_to_timestamp(
            base, F.lit(oracle_fmt_to_spark(fmt, lenient=True))
        ).cast("date")
    return base  # Varchar / UknownType -> string


def read_csv(
    spark: SparkSession,
    path: str,
    meta: TableMeta,
    options: CSVOptions | None = None,
) -> DataFrame:
    """readCSV/readCSVwithOptions + toRTable: positional columns coerced
    per the declared metadata."""
    opts = options or CSVOptions()
    raw = (
        spark.read.option("sep", opts.delimiter)
        .option("header", str(opts.has_header).lower())
        # PERMISSIVE + all-string: coercion failures become NULL, the
        # scale-operable version of CSVColumnToRDataTypeError
        .option("mode", "PERMISSIVE")
        .csv(path, inferSchema=False)
    )
    if len(raw.columns) < len(meta.columns):
        raise ValueError(
            f"{path}: file has {len(raw.columns)} columns, "
            f"metadata declares {len(meta.columns)}"
        )
    out = raw.select(
        *[
            _coerce(F.col(raw.columns[i]), dtype).alias(name)
            for i, (name, dtype) in enumerate(meta.columns)
        ]
    )
    return out


def _serialize(name: str, dtype: str) -> F.Column:
    col = F.col(name)
    d = dtype.strip()
    if d == "Double":
        return F.format_string("%.2f", col).alias(name)  # %.2f (CSV.hs:430)
    if d.startswith("Timestamp"):
        return F.date_format(
            col, oracle_fmt_to_spark(STD_TIMESTAMP_FMT)
        ).alias(name)
    if d.startswith("Date"):
        fmt = d.split(None, 1)[1] if " " in d else STD_DATE_FMT
        return F.date_format(col, oracle_fmt_to_spark(fmt)).alias(name)
    return col.cast("string").alias(name)


def write_csv(
    df: DataFrame,
    path: str,
    meta: TableMeta,
    options: CSVOptions | None = None,
    single_file: bool = False,
) -> None:
    """fromRTable + writeCSV: metadata picks the column subset/order and
    the serialization formats. ``single_file`` coalesces to one part
    (small exports only — a distributed sink keeps N parts)."""
    opts = options or CSVOptions()
    out = df.select(*[_serialize(n, t) for n, t in meta.columns])
    if single_file:
        out = out.coalesce(1)
    (
        out.write.option("sep", opts.delimiter)
        .option("header", str(opts.has_header).lower())
        .option("emptyValue", "")
        .mode("overwrite")
        .csv(path)
    )


def copy_csv(
    spark, src: str, dst: str, options: CSVOptions | None = None
) -> None:
    """copyCSV (CSV.hs:302-309) — read a CSV, write it back out
    (readCSV >> writeCSV: a parse/encode round-trip, not a byte copy).
    Distributed: the reader/writer pair handles files of any size; for
    a single local file the output is one part per input split."""
    opts = options or CSVOptions()
    df = (
        spark.read.option("sep", opts.delimiter)
        .option("header", str(opts.has_header).lower())
        .option("inferSchema", "false")
        .csv(src)
    )
    (
        df.write.option("sep", opts.delimiter)
        .option("header", str(opts.has_header).lower())
        .option("emptyValue", "")
        .mode("overwrite")
        .csv(dst)
    )


def head_csv(df: DataFrame):
    """headCSV (CSV.hs:679-680) — the first row (file order for a
    single-file read; arbitrary-but-deterministic otherwise)."""
    return df.head()


def tail_csv(df: DataFrame) -> DataFrame:
    """tailCSV (CSV.hs:683-684) — everything EXCEPT the first row
    (V.tail; the reference uses it to drop a header line). exceptAll
    removes exactly one occurrence; positional semantics are
    approximated because a distributed table is orderless — prefer
    CSVOptions(has_header=True) which drops the header at the reader."""
    return df.exceptAll(df.limit(1))


def print_rtable(df: DataFrame, meta: TableMeta | None = None, n: int = 20) -> None:
    """printRTable (Core.hs:3985) — tabular print to stdout."""
    df.show(n, truncate=False)


def printf_rtable(df: DataFrame, meta: TableMeta, n: int = 20) -> None:
    """printfRTable (Core.hs:3929-3982) — formatted print: the metadata's
    per-column formats (%.2f doubles, Oracle timestamp patterns) are
    applied via the same serializers the CSV sink uses, then shown."""
    df.select(*[_serialize(nm, t) for nm, t in meta.columns]).show(
        n, truncate=False
    )
