from .tables import TABLES, load_table, register_temp_views, scan_parallel

__all__ = ["TABLES", "load_table", "register_temp_views", "scan_parallel"]
