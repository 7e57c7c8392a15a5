from . import dedup, diff, similarity, text

__all__ = ["dedup", "diff", "similarity", "text"]
