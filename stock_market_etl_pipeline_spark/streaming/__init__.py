from .ingest import dedup_stream, start_quote_ingest

__all__ = ["dedup_stream", "start_quote_ingest"]
