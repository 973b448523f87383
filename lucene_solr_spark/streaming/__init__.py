from .ingest import index_stream, ingest_batch  # noqa: F401
