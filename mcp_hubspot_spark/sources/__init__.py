from .catalog import load_table, load_tables, register_views
from .files import read_csv, read_jsonl, valid_rows, corrupt_rows, write_partitioned
from .zonemap import build_zonemap, read_pruned, write_zordered

__all__ = [
    "load_table",
    "load_tables",
    "register_views",
    "read_csv",
    "read_jsonl",
    "valid_rows",
    "corrupt_rows",
    "write_partitioned",
    "build_zonemap",
    "read_pruned",
    "write_zordered",
]
