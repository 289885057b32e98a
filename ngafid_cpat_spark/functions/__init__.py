from . import geo, text, vector  # noqa: F401
