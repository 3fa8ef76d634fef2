from .catalog import load_table, load_tables, register_views
from .files import read_csv, read_jsonl, valid_rows, corrupt_rows, write_partitioned

__all__ = [
    "load_table",
    "load_tables",
    "register_views",
    "read_csv",
    "read_jsonl",
    "valid_rows",
    "corrupt_rows",
    "write_partitioned",
]
