from .clean import clean_quotes, dedup_keep_last
from .enrich import SYMBOL_DATE_WINDOW, enrich

__all__ = ["clean_quotes", "dedup_keep_last", "SYMBOL_DATE_WINDOW", "enrich"]
