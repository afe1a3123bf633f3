from .ingest import stream_events, streaming_ingest_once

__all__ = ["stream_events", "streaming_ingest_once"]
