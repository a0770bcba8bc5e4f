from .ingest import stream_mention_counts, stream_segments  # noqa: F401
