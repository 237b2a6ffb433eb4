from . import compaction, dedup, multimodal, similarity, textops, tree

__all__ = ["compaction", "dedup", "multimodal", "similarity", "textops", "tree"]
