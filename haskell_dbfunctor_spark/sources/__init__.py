from .csv import (  # noqa: F401
    CSVOptions, TableMeta, copy_csv, read_csv, write_csv,
)
