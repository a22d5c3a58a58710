from . import agg, chunk, dedup, events, graph, joins, layout, multimodal, sampling, similarity, skew  # noqa: F401
