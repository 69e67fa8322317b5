from . import barrels, compression, dedup, indexing, multimodal, search, similarity  # noqa: F401
