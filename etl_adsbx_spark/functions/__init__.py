from . import bpe, classify, scalar, signals, text, vector  # noqa: F401
