from .csv import CSVOptions, TableMeta, read_csv, write_csv  # noqa: F401
