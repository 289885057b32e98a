from . import sessions, stateful  # noqa: F401
