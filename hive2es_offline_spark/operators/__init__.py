from . import document, routing, dedup, similarity, text, multimodal

__all__ = ["document", "routing", "dedup", "similarity", "text", "multimodal"]
