from . import corpus, flagship, monitor, rag, training  # noqa: F401
