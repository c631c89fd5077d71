from .tables import TABLES, load_table, load_tables, with_row_id
from .sinks import write_partitioned, write_bucketed, write_zordered, zorder_key
from .formats import read_any, register_views
from .local import from_arrays, from_pandas
from .warc import extract_warc_records, parse_warc_records, read_warc

__all__ = ["TABLES", "load_table", "load_tables", "with_row_id",
           "write_partitioned", "write_bucketed", "write_zordered",
           "zorder_key", "read_any",
           "register_views", "from_arrays", "from_pandas",
           "read_warc", "extract_warc_records", "parse_warc_records"]
