from .tables import TABLES, load, load_all, read_csv  # noqa: F401
