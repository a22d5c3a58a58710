from . import bpe, classify, scalar, text, vector  # noqa: F401
