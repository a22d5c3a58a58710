from . import agg, dedup, joins, multimodal, similarity  # noqa: F401
