from . import agg, chunk, dedup, joins, layout, multimodal, sampling, similarity, skew  # noqa: F401
