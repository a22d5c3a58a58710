from . import agg, dedup, joins, multimodal, sampling, similarity, skew  # noqa: F401
