from . import agg, chunk, dedup, joins, multimodal, sampling, similarity, skew  # noqa: F401
