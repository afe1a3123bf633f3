from .tables import TABLES, read_table, read_sf_dir

__all__ = ["TABLES", "read_table", "read_sf_dir"]
