from . import geo, text, timeutil, vector  # noqa: F401
from .timeutil import epoch_seconds  # noqa: F401
