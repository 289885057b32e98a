from .queries import ORACLES, PRIORITY, QUERIES  # noqa: F401
