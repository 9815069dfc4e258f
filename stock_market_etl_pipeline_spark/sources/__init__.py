from .tables import TABLE_NAMES, load_table, load_tables
from .ticks import ticks

__all__ = ["TABLE_NAMES", "load_table", "load_tables", "ticks"]
