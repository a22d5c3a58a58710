from . import files, http  # noqa: F401
