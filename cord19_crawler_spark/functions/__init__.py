from . import hashes, text, urls  # noqa: F401
