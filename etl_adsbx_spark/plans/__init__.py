from . import corpus, flagship, rag, training  # noqa: F401
