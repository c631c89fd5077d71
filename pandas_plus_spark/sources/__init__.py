from .tables import TABLES, load_table, load_tables, with_row_id

__all__ = ["TABLES", "load_table", "load_tables", "with_row_id"]
