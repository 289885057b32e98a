from .tables import TABLES, jdbc_table, load, load_all, read_csv  # noqa: F401
