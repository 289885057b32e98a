from . import dedup, joins, multimodal, similarity, windows  # noqa: F401
