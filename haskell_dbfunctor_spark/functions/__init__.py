from .scalar import (
    decode,
    instr0,
    nvl,
    oracle_fmt_to_spark,
    rdt_append,
    remove_char_around,
    rtimestamp_to_text,
    strip_rtext,
    to_rtimestamp,
)

__all__ = [
    "decode",
    "instr0",
    "nvl",
    "oracle_fmt_to_spark",
    "rdt_append",
    "remove_char_around",
    "rtimestamp_to_text",
    "strip_rtext",
    "to_rtimestamp",
]
