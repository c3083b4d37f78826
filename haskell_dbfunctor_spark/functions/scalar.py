"""Scalar function library — reference §2.8, as native Column
expressions (JVM-side, whole-stage-codegen'd; no Python in the path).

NULL semantics come for free: Spark comparisons/arithmetic with NULL
yield NULL which filters as false, matching the reference's Eq/Num
instances (/root/reference/src/RTable/Core.hs:802-824, :855-891).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def nvl(col: Column, default) -> Column:
    """nvl (Core.hs:994-1001) — coalesce(x, default)."""
    d = default if isinstance(default, Column) else F.lit(default)
    return F.coalesce(col, d)


def decode(col: Column, *pairs, default=None) -> Column:
    """Oracle DECODE (decodeColValue, Core.hs:1028-1050), extended to
    multiple (search, result) pairs. Null-safe equality: DECODE treats
    NULL == NULL as a match (unlike `=`), hence eqNullSafe."""
    if len(pairs) % 2:
        raise ValueError("decode takes (search, result) pairs")
    expr = None
    for i in range(0, len(pairs), 2):
        s, r = pairs[i], pairs[i + 1]
        s = s if isinstance(s, Column) else F.lit(s)
        r = r if isinstance(r, Column) else F.lit(r)
        cond = col.eqNullSafe(s)
        expr = F.when(cond, r) if expr is None else expr.when(cond, r)
    d = default if isinstance(default, Column) else F.lit(default)
    return expr.otherwise(d)


def nvl_table(df, default, cols=None):
    """nvlRTable (Core.hs:1084-1100): replace NULL with ``default`` in
    every column (or the given subset). Thin over DataFrame.fillna —
    one projection, no extra pass."""
    return df.fillna(default, subset=list(cols) if cols else None)


def decode_table(df, search, result, cols=None):
    """decodeRTable (Core.hs:1054-1081): apply the same DECODE
    (search -> result) to every column (or a subset), preserving other
    values. One projection of per-column CASE expressions."""
    target = set(cols) if cols else set(df.columns)
    return df.select(
        *[
            decode(F.col(c), search, result, default=F.col(c)).alias(c)
            if c in target
            else F.col(c)
            for c in df.columns
        ]
    )


def instr0(col: Column, substr: str) -> Column:
    """0-based INSTR (reference instr, Core.hs:1423-1451, returns
    Maybe position 0-based → NULL when absent). Spark's instr/locate is
    1-based, hence the -1."""
    pos = F.instr(col, substr)
    return F.when(pos > 0, pos - 1)


def strip_rtext(col: Column) -> Column:
    """stripRText (Core.hs:1107-1111) — trim whitespace both ends."""
    return F.trim(col)


def rdt_append(a: Column, b: Column) -> Column:
    """rdtappend (Core.hs:1114-1119) — Null-safe concat: any NULL ⇒
    NULL (Spark concat is null-propagating, matching the reference)."""
    return F.concat(a, b)


def remove_char_around(col: Column, ch: str) -> Column:
    """removeCharAroundRText (Core.hs:1123-1125) — dropAround a char."""
    return F.btrim(col, F.lit(ch))


# ---------------------------------------------------------------- time
# The reference parses/serializes timestamps with Oracle-style format
# strings ("DD/MM/YYYY HH24:MI:SS", toRTimestamp Core.hs:1182-1397).
# Spark wants Java DateTimeFormatter patterns; the translation is a
# small pure function applied at plan-build time.

_ORACLE_TOKENS = [
    ("HH24", "HH"),
    ("HH12", "hh"),
    ("YYYY", "yyyy"),
    ("MI", "mm"),
    ("SS", "ss"),
    ("DD", "dd"),
    ("HH", "HH"),  # reference treats bare HH as 24h (Core.hs:1256-1284)
    # MM stays MM (month)
]

# parsing must be lenient (the reference accepts "1/12/1991",
# toRTimestamp Core.hs:1182-1397); single-letter Java patterns parse
# 1-or-2 digits, double-letter ones are exact-width
_ORACLE_TOKENS_LENIENT = [
    ("HH24", "H"),
    ("HH12", "h"),
    ("YYYY", "yyyy"),
    ("MI", "m"),
    ("SS", "s"),
    ("DD", "d"),
    ("MM", "M"),
    ("HH", "H"),
]


def oracle_fmt_to_spark(fmt: str, lenient: bool = False) -> str:
    """Translate an Oracle/reference datetime format to a Spark one.
    ``lenient=True`` produces a parse pattern tolerating unpadded
    day/month/hour fields; default produces the zero-padded output
    pattern."""
    tokens = _ORACLE_TOKENS_LENIENT if lenient else _ORACLE_TOKENS
    out = ""
    i = 0
    n = len(fmt)
    while i < n:
        for tok, rep in tokens:
            if fmt[i : i + len(tok)] == tok:
                out += rep
                i += len(tok)
                break
        else:
            out += fmt[i]
            i += 1
    return out


def to_rtimestamp(col: Column, oracle_fmt: str) -> Column:
    """toRTimestamp (Core.hs:1182-1397): parse text per Oracle format.
    Unparseable values yield NULL (the reference throws
    UnsupportedTimeStampFormat; at scale a NULL + validation metric is
    the operable contract — SURVEY.md §1.3). Lenient like the
    reference: unpadded day/month/hour fields parse."""
    return F.try_to_timestamp(col, F.lit(oracle_fmt_to_spark(oracle_fmt, lenient=True)))


def rtimestamp_to_text(col: Column, oracle_fmt: str = "DD/MM/YYYY HH24:MI:SS") -> Column:
    """rTimestampToRText (Core.hs:1589-1624)."""
    return F.date_format(col, oracle_fmt_to_spark(oracle_fmt))
