from .ingest import stream_pages_to_store  # noqa: F401
