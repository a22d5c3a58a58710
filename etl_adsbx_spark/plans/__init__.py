from . import flagship  # noqa: F401
