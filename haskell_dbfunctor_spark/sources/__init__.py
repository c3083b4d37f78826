from .csv import (  # noqa: F401
    CSVOptions, TableMeta, copy_csv, read_csv, write_csv,
)
from .debezium import (  # noqa: F401
    parse_debezium, read_debezium_jsonl, stream_debezium_jsonl,
    to_debezium_json,
)
