from .ingest import stream_events, streaming_ingest_once
from .sessionize import streaming_sessionize

__all__ = ["stream_events", "streaming_ingest_once", "streaming_sessionize"]
