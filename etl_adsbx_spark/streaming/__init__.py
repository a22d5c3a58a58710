from . import dedup, windows  # noqa: F401
