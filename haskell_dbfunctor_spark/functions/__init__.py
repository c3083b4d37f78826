from .scalar import (
    decode,
    decode_table,
    instr0,
    nvl,
    nvl_table,
    oracle_fmt_to_spark,
    rdt_append,
    remove_char_around,
    rtimestamp_to_text,
    strip_rtext,
    to_rtimestamp,
)

__all__ = [
    "decode",
    "decode_table",
    "instr0",
    "nvl",
    "nvl_table",
    "oracle_fmt_to_spark",
    "rdt_append",
    "remove_char_around",
    "rtimestamp_to_text",
    "strip_rtext",
    "to_rtimestamp",
]
