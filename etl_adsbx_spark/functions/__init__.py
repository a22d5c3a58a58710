from . import bpe, scalar, text, vector  # noqa: F401
