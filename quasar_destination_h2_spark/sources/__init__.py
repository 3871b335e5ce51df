from .csv_format import CSV_READ_OPTIONS, CSV_WRITE_OPTIONS, read_csv, write_csv
from .sink import CsvCreateSink, ensure_valid_table_name
from .tables import TableSet, load_table, register_views

__all__ = [
    "CSV_READ_OPTIONS",
    "CSV_WRITE_OPTIONS",
    "read_csv",
    "write_csv",
    "CsvCreateSink",
    "ensure_valid_table_name",
    "TableSet",
    "load_table",
    "register_views",
]
