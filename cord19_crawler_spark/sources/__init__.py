from . import cord19  # noqa: F401
