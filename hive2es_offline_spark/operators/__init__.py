from . import (
    dedup,
    document,
    embeddings,
    multimodal,
    quality,
    routing,
    sampling,
    similarity,
    text,
)

__all__ = [
    "dedup",
    "document",
    "embeddings",
    "multimodal",
    "quality",
    "routing",
    "sampling",
    "similarity",
    "text",
]
