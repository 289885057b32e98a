from .queries import ORACLES, QUERIES  # noqa: F401
